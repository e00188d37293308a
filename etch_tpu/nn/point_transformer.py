"""Point Transformer U-Net heads on dense batched clouds.

Rebuild of reference `src/models/pointtransformer_seg.py` (vector-attention
layer :8-37, TransitionDown :40-68, TransitionUp :71-98, block :101-122,
confidence net :125-195, magnitude net :199-260).

TPU-first changes:
  - dense (B, N, C) batching; the reference's offset-array ragged layout
    (pointops) collapses because ETCH always uses equal-sized clouds
    (src/models/models_pointcloud.py:82-92).
  - neighbor search is the MXU-tiled brute-force kNN from etch_tpu.ops
    instead of the CUDA register-heap kernel.
  - BatchNorm statistics are taken over (batch, points[, neighbors]) which is
    exactly what torch BatchNorm1d sees on the flattened (B*N, C) layout.
  - every BatchNorm uses momentum=0.9: torch's default momentum 0.1 means
    running = 0.9*old + 0.1*new, i.e. flax momentum 0.9.  Flax's own default
    (0.99) leaves the running stats ~5% at their init values after O(100)
    steps, which compounds across the U-Net's ~30 BN layers and collapses
    eval-mode accuracy (measured: 0.999 train-mode vs 0.107 eval-mode label
    accuracy after a 300-step overfit).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from etch_tpu.nn.pallas_grouped_head import fused_grouped_head
from etch_tpu.nn.pallas_vector_attention import (vector_attention_pallas,
                                                 vector_attention_ref)
from etch_tpu.ops import (fps, gather_points, group_points,
                          group_points_transposed, knn, knn_interpolate)

Array = jnp.ndarray

_BN_EPS = 1e-5
_BN_MOM = 0.9  # torch BatchNorm1d momentum 0.1 == flax momentum 0.9


def unet_geometry(
    p: Array,
    strides: Sequence[int] = (1, 4, 4, 4, 4),
    nsamples: Sequence[int] = (8, 16, 16, 16, 16),
    interp_k: int = 3,
):
    """Per-level sampling/neighborhood geometry of the U-Net trunk.

    The magnitude and confidence heads run structurally identical trunks over
    the *same* cloud, so all coordinate-only queries (FPS downsampling, the
    grouping kNN, per-level self-kNN, decoder 3-NN interpolation) are computed
    once here and shared — the reference recomputes them inside each head
    (pointtransformer_seg.py:52-98), paying the CUDA kernels twice.

    Returns a list of per-level dicts:
      down: (fps_idx, group_idx) for stride>1 levels
      down_pr: (B, M, ns, 3) grouped relative coords for the TransitionDown
      self: (B, M, ns) self-kNN indices
      p_r:  (B, M, ns, 3) relative coords of the self-kNN neighborhood —
            IDENTICAL for every attention block at a level (and for both
            U-Net heads), so gathered once here instead of inside each of
            the 36 vector-attention layers (and outside the training-remat
            boundary, so the backward does not re-gather them either)
      up:   (idx, dist) 3-NN of this level's points among the coarser level's
    """
    levels = []
    cur_p = p
    ps = []
    for lvl, s in enumerate(strides):
        ent = {}
        if s > 1:
            N = cur_p.shape[1]
            M = max(1, N // s)
            idx = fps(cur_p, M)
            new_p = gather_points(cur_p, idx)
            nidx, _ = knn(new_p, cur_p, nsamples[lvl])
            ent["down"] = (idx, nidx)
            ent["down_pr"] = group_points(cur_p, nidx) - new_p[:, :, None, :]
            cur_p = new_p
        sidx, _ = knn(cur_p, cur_p, min(nsamples[lvl], cur_p.shape[1]))
        ent["self"] = sidx
        ent["p_r"] = group_points(cur_p, sidx) - cur_p[:, :, None, :]
        ps.append(cur_p)
        levels.append(ent)
    for lvl in range(len(strides) - 1):
        levels[lvl]["up"] = knn(ps[lvl], ps[lvl + 1], interp_k)
    return levels


class PointTransformerLayer(nn.Module):
    """Vector attention over k nearest neighbors (reference :8-37)."""

    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p: Array, x: Array, train: bool, idx: Array = None,
                 p_r: Array = None) -> Array:
        # p: (B, N, 3), x: (B, N, C); idx: optional precomputed (B, N, ns)
        # neighbor indices (the U-Net computes them once per level instead of
        # once per block — the reference re-queries in every layer,
        # pointtransformer_seg.py:28-29); p_r: optional precomputed relative
        # coords of that neighborhood (identical across blocks at a level)
        c = self.out_planes
        s = self.share_planes
        x_q = nn.Dense(c, name="linear_q", dtype=self.dtype)(x)
        x_k = nn.Dense(c, name="linear_k", dtype=self.dtype)(x)
        x_v = nn.Dense(c, name="linear_v", dtype=self.dtype)(x)

        if idx is None:
            idx, _ = knn(p, p, self.nsample)                # (B, N, ns)
        if p_r is None:
            p_r = group_points(p, idx) - p[:, :, None, :]   # (B, N, ns, 3)
        B, N, ns = idx.shape
        R = B * N
        use_pallas = (
            not train
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.bfloat16
            and os.environ.get("ETCH_VECATT_PALLAS", "1") == "1"
        )
        if use_pallas:
            # neighbor-major operands for the fused kernel: the gathers
            # produce (ns, R, c) for free from transposed indices, and the
            # posenc MLP runs on the transposed relative coords directly
            g_k = group_points_transposed(x_k, idx)         # (ns, R, c)
            g_v = group_points_transposed(x_v, idx)
            pe_in = p_r.transpose(2, 0, 1, 3).reshape(ns, R, 3)
        else:
            g_k = group_points(x_k, idx)                    # (B, N, ns, c)
            g_v = group_points(x_v, idx)
            pe_in = p_r

        # positional encoding MLP: Linear(3,3) -> BN -> ReLU -> Linear(3,c)
        pe = nn.Dense(3, name="linear_p0", dtype=self.dtype)(pe_in)
        pe = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="linear_p_bn", dtype=self.dtype)(pe)
        pe = nn.relu(pe)
        pe = nn.Dense(c, name="linear_p1", dtype=self.dtype)(pe)

        # w-chain parameters declared explicitly (flax-equivalent init and
        # semantics) so the inference path can hand raw weights + folded BN
        # affines to the fused Pallas kernel while training keeps batch-stat
        # updates
        cs = c // s
        sc0 = self.param("w_bn0_scale", nn.initializers.ones, (c,))
        sh0 = self.param("w_bn0_bias", nn.initializers.zeros, (c,))
        sc1 = self.param("w_bn1_scale", nn.initializers.ones, (cs,))
        sh1 = self.param("w_bn1_bias", nn.initializers.zeros, (cs,))
        w0k = self.param("w0_kernel", nn.initializers.lecun_normal(), (c, cs))
        w0b = self.param("w0_bias", nn.initializers.zeros, (cs,))
        w1k = self.param("w1_kernel", nn.initializers.lecun_normal(), (cs, cs))
        w1b = self.param("w1_bias", nn.initializers.zeros, (cs,))
        m0 = self.variable("batch_stats", "w_bn0_mean",
                           lambda: jnp.zeros((c,), jnp.float32))
        v0 = self.variable("batch_stats", "w_bn0_var",
                           lambda: jnp.ones((c,), jnp.float32))
        m1 = self.variable("batch_stats", "w_bn1_mean",
                           lambda: jnp.zeros((cs,), jnp.float32))
        v1 = self.variable("batch_stats", "w_bn1_var",
                           lambda: jnp.ones((cs,), jnp.float32))

        if train:
            w = (g_k - x_q[:, :, None, :] + pe).astype(jnp.float32)
            mu = jnp.mean(w, axis=(0, 1, 2))
            var = jnp.var(w, axis=(0, 1, 2))
            if not self.is_initializing():
                m0.value = _BN_MOM * m0.value + (1 - _BN_MOM) * mu
                v0.value = _BN_MOM * v0.value + (1 - _BN_MOM) * var
            w = (w - mu) * (sc0 / jnp.sqrt(var + _BN_EPS)) + sh0
            w = nn.relu(w)
            w = (w.astype(w0k.dtype) @ w0k + w0b).astype(jnp.float32)
            mu1 = jnp.mean(w, axis=(0, 1, 2))
            var1 = jnp.var(w, axis=(0, 1, 2))
            if not self.is_initializing():
                m1.value = _BN_MOM * m1.value + (1 - _BN_MOM) * mu1
                v1.value = _BN_MOM * v1.value + (1 - _BN_MOM) * var1
            w = (w - mu1) * (sc1 / jnp.sqrt(var1 + _BN_EPS)) + sh1
            w = nn.relu(w)
            w = (w.astype(w1k.dtype) @ w1k + w1b).astype(jnp.float32)
            w = nn.softmax(w, axis=2)                    # (B, N, ns, cs)
            v = (g_v + pe).astype(jnp.float32).reshape(B, N, ns, s, cs)
            out = jnp.sum(v * w[:, :, :, None, :], axis=2)  # (B, N, s, cs)
            return out.reshape(B, N, c).astype(x.dtype)

        # inference: fold running stats into affines (BN is an affine at
        # eval; the Dense-0 bias folds into the BN-1 affine) and run the
        # whole post-gather chain in one fused call — Pallas on TPU/bf16,
        # the XLA reference elsewhere
        s0e = sc0 / jnp.sqrt(v0.value + _BN_EPS)
        a0 = jnp.stack([s0e, sh0 - m0.value * s0e])      # (2, c)
        s1e = sc1 / jnp.sqrt(v1.value + _BN_EPS)
        a1 = jnp.stack([s1e, (w0b - m1.value) * s1e + sh1])  # (2, cs)
        if use_pallas:
            out = vector_attention_pallas(
                x_q.reshape(R, c), g_k, g_v, pe, a0, w0k, a1, w1k, w1b[None]
            )
        else:
            out = vector_attention_ref(
                x_q.reshape(R, c), g_k.reshape(R, ns, c),
                g_v.reshape(R, ns, c), pe.reshape(R, ns, c),
                a0, w0k, a1, w1k, w1b[None],
            )
        return out.reshape(B, N, c).astype(x.dtype)


class TransitionDown(nn.Module):
    """FPS + kNN grouping + shared MLP + max-pool (reference :40-68)."""

    out_planes: int
    stride: int = 1
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p: Array, x: Array, train: bool, down=None,
                 down_pr=None):
        if self.stride == 1:
            x = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            return p, nn.relu(x)
        B, N, _ = p.shape
        M = max(1, N // self.stride)
        if down is None:
            idx = fps(p, M)                                 # (B, M)
            new_p = gather_points(p, idx)
            nidx, _ = knn(new_p, p, self.nsample)           # (B, M, ns)
        else:
            idx, nidx = down
            new_p = gather_points(p, idx)
        g_x = group_points(x, nidx)                         # (B, M, ns, C)
        if down_pr is None:
            down_pr = group_points(p, nidx) - new_p[:, :, None, :]
        g_p = down_pr                                       # (B, M, ns, 3)
        h = jnp.concatenate([g_p, g_x], axis=-1)
        h = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(h)
        return new_p, jnp.max(h, axis=2)                    # (B, M, out)


class TransitionUp(nn.Module):
    """Decoder fusion (reference :71-98).  If `is_head`, fuses a global
    summary instead of interpolating from a coarser level."""

    out_planes: int
    is_head: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, p1, x1, p2=None, x2=None, train: bool = True, up=None):
        if self.is_head:
            mean = jnp.mean(x1, axis=1, keepdims=True)      # (B, 1, C)
            g = nn.Dense(x1.shape[-1], name="linear2", dtype=self.dtype)(mean)
            g = nn.relu(g)
            h = jnp.concatenate([x1, jnp.broadcast_to(g, x1.shape)], axis=-1)
            h = nn.Dense(x1.shape[-1], name="linear1", dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
            return nn.relu(h)
        a = nn.Dense(self.out_planes, name="linear1", dtype=self.dtype)(x1)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(a)
        a = nn.relu(a)
        b = nn.Dense(self.out_planes, name="linear2", dtype=self.dtype)(x2)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(b)
        b = nn.relu(b)
        return a + knn_interpolate(p2, p1, b, k=3, use_sqrt=True, idx_dist=up)


class PointTransformerBlock(nn.Module):
    """Residual block around the vector-attention layer (reference :101-122)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, p: Array, x: Array, train: bool, idx: Array = None,
                 p_r: Array = None) -> Array:
        identity = x
        h = nn.Dense(self.planes, use_bias=False, name="linear1", dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = PointTransformerLayer(
            out_planes=self.planes,
            share_planes=self.share_planes,
            nsample=self.nsample,
            dtype=self.dtype,
            name="transformer2",
        )(p, h, train, idx=idx, p_r=p_r)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dense(self.planes, use_bias=False, name="linear3", dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn3")(h)
        return nn.relu(h + identity)


class _BlockScanBody(nn.Module):
    """nn.scan body for a run of identical-shape transformer blocks.

    carry = features x; (p, train, idx) ride along as broadcast inputs.
    Each scan step gets its own parameter slice (variable_axes 0)."""

    planes: int
    share_planes: int
    nsample: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, p, train, idx, p_r):
        x = PointTransformerBlock(
            planes=self.planes,
            share_planes=self.share_planes,
            nsample=self.nsample,
            dtype=self.dtype,
            name="block",
        )(p, x, train, idx=idx, p_r=p_r)
        return x, ()


def _repeated_blocks(n, planes, share_planes, nsample, dtype, name):
    """n stacked transformer blocks compiled once via nn.scan (the unrolled
    loop emitted n copies of the block HLO; at blocks=[2,3,4,6,3] x 2 heads
    that was 26 bodies in the program)."""
    return nn.scan(
        nn.remat(_BlockScanBody, static_argnums=(3,)),
        length=n,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        out_axes=0,
    )(
        planes=planes,
        share_planes=share_planes,
        nsample=nsample,
        dtype=dtype,
        name=name,
    )


class PointTransformerUNet(nn.Module):
    """Shared 5-level encoder/decoder trunk (reference :125-260).

    Returns per-point features at full resolution, (B, N, planes[0]).
    """

    planes: Sequence[int]
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    nsamples: Sequence[int] = (8, 16, 16, 16, 16)
    share_planes: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, p: Array, x: Array, train: bool, geom=None) -> Array:
        # geom: optional precomputed unet_geometry(p, ...) shared between the
        # magnitude and confidence trunks (they see the same cloud)
        if geom is None:
            geom = unet_geometry(p, self.strides, self.nsamples)
        # remat: block activations at full resolution dominate training
        # memory; recompute them in the backward pass (static_argnums marks
        # the python-bool `train` flag)
        Block = nn.remat(PointTransformerBlock, static_argnums=(3,))
        skips = []
        level_idx = []   # per-level self-kNN, shared by all blocks at a level
        for lvl in range(5):
            p, x = TransitionDown(
                out_planes=self.planes[lvl],
                stride=self.strides[lvl],
                nsample=self.nsamples[lvl],
                dtype=self.dtype,
                name=f"enc{lvl+1}_down",
            )(p, x, train, down=geom[lvl].get("down"),
              down_pr=geom[lvl].get("down_pr"))
            idx = geom[lvl]["self"]
            level_idx.append((idx, geom[lvl].get("p_r")))
            n_rep = self.blocks[lvl] - 1
            if n_rep > 0:
                x, _ = _repeated_blocks(
                    n_rep,
                    planes=self.planes[lvl],
                    share_planes=self.share_planes,
                    nsample=self.nsamples[lvl],
                    dtype=self.dtype,
                    name=f"enc{lvl+1}_blocks",
                )(x, p, train, idx, geom[lvl].get("p_r"))
            skips.append((p, x))

        # decoder head at the coarsest level
        p5, x5 = skips[4]
        x = TransitionUp(out_planes=self.planes[4], is_head=True, dtype=self.dtype, name="dec5_up")(
            p5, x5, train=train
        )
        x = Block(
            planes=self.planes[4],
            share_planes=self.share_planes,
            nsample=self.nsamples[4],
            dtype=self.dtype,
            name="dec5_block1",
        )(p5, x, train, level_idx[4][0], level_idx[4][1])

        for lvl in range(3, -1, -1):
            p_f, x_f = skips[lvl]
            p_c = skips[lvl + 1][0]
            x = TransitionUp(out_planes=self.planes[lvl], dtype=self.dtype, name=f"dec{lvl+1}_up")(
                p_f, x_f, p_c, x, train=train, up=geom[lvl].get("up")
            )
            x = Block(
                planes=self.planes[lvl],
                share_planes=self.share_planes,
                nsample=self.nsamples[lvl],
                dtype=self.dtype,
                name=f"dec{lvl+1}_block1",
            )(p_f, x, train, level_idx[lvl][0], level_idx[lvl][1])
        return x


class PointTransformerSeg(nn.Module):
    """Magnitude / confidence task heads over the shared trunk.

    mode="magnitude": scalar per point (reference :199-260).
    mode="confidence": (part_logits (B,N,k), confidence (B,N,1))
      via the softmax-weighted per-part grouped head (reference :125-195).
    """

    mode: str
    num_classes: int = 1
    planes: Sequence[int] = (64, 128, 256, 256, 512)
    blocks: Sequence[int] = (2, 3, 4, 6, 3)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    nsamples: Sequence[int] = (8, 16, 16, 16, 16)
    dtype: Any = None  # e.g. jnp.bfloat16 for bandwidth-bound inference

    @nn.compact
    def __call__(self, p: Array, feat: Array, train: bool = True, geom=None):
        x = jnp.concatenate([p, feat], axis=-1)
        h = PointTransformerUNet(
            planes=self.planes, blocks=self.blocks, strides=self.strides,
            nsamples=self.nsamples, dtype=self.dtype, name="unet",
        )(p, x, train, geom=geom)
        B, N, c0 = h.shape

        if self.mode == "magnitude":
            y = nn.Dense(c0, name="final0", dtype=self.dtype)(h)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="final_bn")(y)
            y = nn.relu(y)
            return nn.Dense(1, name="final1", dtype=self.dtype)(y)            # (B, N, 1)

        assert self.mode == "confidence"
        k = self.num_classes
        # classification branch (reference :144)
        y = nn.Dense(c0, name="cls0", dtype=self.dtype)(h)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="cls_bn")(y)
        y = nn.relu(y)
        logits = nn.Dense(k, name="cls1", dtype=self.dtype)(y)                # (B, N, k)

        # per-part confidence branch: Conv1d(c0, c0*k) -> ReLU -> grouped
        # Conv1d(c0*k, k, groups=k) (reference :145).  The grouped conv is a
        # per-class (c0 -> 1) projection.  At inference on TPU the whole
        # branch runs as a fused Pallas kernel so the (B, N, k*c0)
        # intermediate (880 MB at production shape) never touches HBM.
        w0k = self.param("confi0_kernel", nn.initializers.lecun_normal(),
                         (c0, c0 * k))
        w0b = self.param("confi0_bias", nn.initializers.zeros, (c0 * k,))
        Wg = self.param(
            "confi1_w", nn.initializers.xavier_uniform(), (k, c0)
        )
        bg = self.param("confi1_b", nn.initializers.zeros, (k,))
        use_pallas = (
            not train
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.bfloat16
            and os.environ.get("ETCH_VECATT_PALLAS", "1") == "1"
        )
        per_part = fused_grouped_head(
            h.reshape(B * N, c0), w0k, w0b, Wg, bg, use_pallas
        ).reshape(B, N, k)                                  # (B, N, k)

        parts_softmax = nn.softmax(logits, axis=-1)
        confidence = jnp.sum(per_part * parts_softmax, axis=-1, keepdims=True)
        return logits, confidence
