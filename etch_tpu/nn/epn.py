"""SE(3)-locally-equivariant point network (EPN) backbone, TPU-first.

Re-design of the reference's vgtk SO(3)-conv stack
(`external/vgtk/vgtk/so3conv/{modules.py, functional.py}` and ETCH's block
wrappers `src/models/so3conv.py:7-183`, builder `src/models/so3net.py:36-152`).

Differences from the CUDA/torch design, on purpose:
  - dense static (B, P, A, C) batching (anchor dim A=60, channels last);
    no offset arrays, no ragged clouds.
  - the inter-conv kernel-influence weights
    w = relu(1 - |x - R_a k|^2 / sigma)   (reference functional.py:286-324)
    are never materialized for the full cloud: we stream over point chunks
    with lax.map, computing the (chunk, nn, A, K) weight block and contracting
    it against the grouped features and the (K*C_in -> C_out) projection in
    one fused region.  Peak memory is O(chunk * nn * A * K) instead of
    O(P * nn * A * K) (~GBs at N=5000).
  - grouping indices come from etch_tpu.ops (FPS / ball query with the
    reference's repeat-fill semantics), so no shadow-point padding is needed:
    every gathered neighbor is a real point, exactly as in the reference where
    the shadow index is never emitted (grouping_cuda_kernel.cu:99-112).
  - rotation-group (intra) conv gathers along the precomputed right-
    multiplication adjacency (etch_tpu.geometry.get_intra_idx) and reduces to
    a single (12*C_in -> C_out) matmul on the MXU.
"""

from __future__ import annotations

import os
from typing import Any, List, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.geometry import get_anchors, get_intra_idx, get_kernel_points
from etch_tpu.nn.pallas_interconv import interconv_ones_proj, interconv_t
from etch_tpu.ops import ball_query, fps, gather_points, group_points
from etch_tpu.ops.grouping import materialize_rows

Array = jnp.ndarray


class ConvSpec(NamedTuple):
    """Static descriptor of one separable conv (hashable, so it can live as a
    flax module attribute)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    lazy_sample: bool
    n_in: int
    n_out: int
    # explicit "features are all-ones occupancy" marker for the backbone's
    # first conv (reference functional.py:70-89): the inter conv then skips
    # the feature gather outright.  Explicit rather than inferred from
    # dim_in == 1 so a genuine 1-channel feature input is never silently
    # mis-handled.
    occupancy_input: bool = False


class SphericalCloud(NamedTuple):
    """Value type of the equivariant stack (reference so3conv/base.py:5-23).

    xyz:   (B, P, 3)
    feats: (B, P, A, C)  -- anchor-indexed regular-representation features
    """

    xyz: Array
    feats: Array


def occupancy_features(xyz: Array, n_anchor: int = 60) -> Array:
    """All-ones occupancy input features (reference functional.py:70-89)."""
    B, P, _ = xyz.shape
    return jnp.ones((B, P, n_anchor, 1), dtype=xyz.dtype)


class InstanceNormPA(nn.Module):
    """InstanceNorm over the (point, anchor) axes per channel, no affine.

    Matches torch nn.InstanceNorm2d(C, affine=False) applied to (B, C, P, A)
    (reference src/models/so3conv.py:27,85,168): statistics are computed per
    (batch, channel) over P and A, at eval time as well (torch instance norm
    has no running stats by default).
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, P, A, C)
        # stats in f32: a bf16-accumulated mean over ~150k elements loses
        # ~3 mantissa bits (the conv stream hands bf16 feats at inference)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class InterSO3Conv(nn.Module):
    """Spatial equivariant conv (reference vgtk modules.py:92-128).

    One call does: FPS (or lazy arange) stride subsampling -> ball query ->
    streamed kernel-influence contraction -> (K*C_in -> C_out) projection.
    """

    dim_in: int
    dim_out: int
    kernel_size: int      # kernel-point family: 1 -> 24 points
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    lazy_sample: bool
    # features are identically-1 occupancy input (first conv): skip the
    # feature gather; the contraction is a neighbor-sum of weights
    occupancy_input: bool = False
    # bf16 streaming dtype when set (EtchConfig.use_bfloat16); None keeps
    # the policy dtype (f32 training, reference TF32-off semantics)
    compute_dtype: Any = None
    # points per streamed step: peak memory ~ B*chunk*nn*A*K floats for the
    # kernel-weight block (~400 MB at B=4, nn=64, 60x24, chunk=256) — far
    # fewer sequential steps than a VMEM-sized chunk would give, and XLA
    # pipelines each step's HBM traffic against compute.
    chunk: int = 512

    @nn.compact
    def __call__(self, cloud: SphericalCloud):
        xyz, feats = cloud
        B, P, A, C = feats.shape
        assert C == self.dim_in

        kernels = get_kernel_points(self.radius, self.kernel_size)   # (K, 3)
        anchors = get_anchors(A)                                     # (A, 3, 3)
        K = kernels.shape[0]
        # rotated kernel points, static constant: (A*K, 3)
        rk = np.einsum("aij,kj->aki", anchors, kernels).reshape(A * K, 3)
        rk = jnp.asarray(rk, dtype=xyz.dtype)

        P2 = -(-P // self.stride)
        sample_idx = fps(xyz, P2, lazy=self.lazy_sample)             # (B, P2)
        new_xyz = gather_points(xyz, sample_idx)                     # (B, P2, 3)
        nbr_idx = ball_query(new_xyz, xyz, self.radius, self.n_neighbor)

        W = self.param(
            "W",
            nn.initializers.xavier_uniform(),
            (K * self.dim_in, self.dim_out),
            feats.dtype,
        )
        bias = self.param(
            "bias", nn.initializers.constant(1e-3), (self.dim_out,), feats.dtype
        )

        nn_k = self.n_neighbor

        chunk = min(int(os.environ.get("ETCH_INTERCONV_CHUNK",
                                       str(self.chunk))), P2)
        pad = (-P2) % chunk
        idx_c = jnp.pad(nbr_idx, ((0, 0), (0, pad), (0, 0))).reshape(
            B, -1, chunk, nn_k
        )
        ctr_c = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0))).reshape(
            B, -1, chunk, 3
        )
        n_chunks = idx_c.shape[1]

        # The contraction streams ~|chunk|*nn*(A*K + A*C) floats per chunk
        # through HBM (the kernel-weight block and the gathered features) —
        # it is bandwidth-bound, so with use_bfloat16 both stream in bfloat16
        # with f32 accumulation (f32 otherwise, preserving the reference's
        # TF32-off training policy).  The reduction over nn=64 keeps f32
        # partials via preferred_element_type.
        # Features are flattened to (A*C,) rows BEFORE the gather: gathering
        # (A, C)-shaped rows and flattening after forces a physical (8,128)
        # retile of the 0.5 GB gathered block (measured 18.6 ms vs 5.7 ms
        # per conv at production shapes).
        # C == 1 means all-ones occupancy input (the backbone's first conv,
        # occupancy_features above): the contraction degenerates to a
        # neighbor-sum of the weights — skip the feature gather entirely.
        # materialize_rows pins the gather source to the default row-major
        # tiled layout — XLA otherwise batch-interleaves it to suit the
        # surrounding dots and every gathered row becomes a strided read
        # (profiled 3.6-7 ms/gather vs ~1 ms).
        occupancy = self.occupancy_input
        if occupancy:
            assert C == 1, (
                f"occupancy_input conv expects 1-channel all-ones features, "
                f"got C={C}"
            )
        stream_dt = self.compute_dtype or feats.dtype
        feats_c = (
            None if occupancy
            else materialize_rows(feats.astype(stream_dt).reshape(B, P, A * C))
        )
        rk_arr = jnp.asarray(rk)
        # ETCH_INTERCONV_PALLAS=0 falls back to the XLA einsum (debugging /
        # A-B benchmarking); the kernel needs A divisible by the anchor group
        use_pallas = (
            jax.default_backend() == "tpu"
            and A % 12 == 0
            and os.environ.get("ETCH_INTERCONV_PALLAS", "1") == "1"
        )
        # 1-pass bf16 kernel-weight matmul (ETCH_FAST_W=1, bf16 streaming
        # only).  OFF by default: despite the w matmul being the measured
        # kernel floor (~3.1 of 6.3 ms per chunk-op), the bf16 dot DOUBLES
        # the end-to-end kernel time (75 -> 152 ms per forward, xprof) —
        # the fourth Mosaic-schedule collapse from touching this matmul
        # (DESIGN.md round-4).  Kept as an env-gated experiment; quality
        # impact if enabled is quantified in docs/evidence/fastw_ab.json.
        fast_w = (
            use_pallas
            and self.compute_dtype == jnp.bfloat16
            and os.environ.get("ETCH_FAST_W", "0") == "1"
        )

        def do_chunk(args):
            idx, ctr = args  # (B, chunk, nn), (B, chunk, 3)
            gx = group_points(xyz, idx) - ctr[:, :, None, :]    # (B,c,nn,3)
            if (occupancy and use_pallas
                    and self.compute_dtype == jnp.bfloat16):
                # occupancy conv with the (K -> Cout) projection fused into
                # the kernel: removes the XLA projection + concat
                # read-modify-write chains over the (B, c, A, K)
                # intermediate (~10.5 ms/forward at B=8, trace r5).
                # Output stays f32: a bf16 chunk output makes the NEXT
                # conv's gather 4-5x slower (XLA lays the bf16 concat out
                # badly for row gathers — measured 8.3 vs <2 ms per gather,
                # trace r5c), which dwarfs the halved concat traffic.
                out = interconv_ones_proj(
                    gx, W.reshape(K, self.dim_out), rk_arr,
                    float(self.sigma), A,
                    os.environ.get("ETCH_FAST_W_ONES", "1") == "1")
                return out + bias
            gf2 = None if occupancy else group_points(feats_c, idx)
            # fused Pallas contraction on TPU (see pallas_interconv.py):
            # weights are computed in-VMEM and never hit HBM; XLA einsum
            # fallback elsewhere and for the backward pass.
            t = interconv_t(gx, gf2, rk_arr, float(self.sigma), A,
                            use_pallas, fast_w)
            # project through the kernel-channel matmul on the MXU.
            # Contract (K, C) directly on the 5D tensor: reshaping to
            # (..., K*C) first makes XLA physically relayout the kernel's
            # output before the dot (~1.5-1.8 ms copy per chunk).
            # bf16 streaming: with bf16 weights + DEFAULT precision the
            # projection runs ~2x the mixed f32 rate (trace r5: 2.5
            # ms/chunk at 49% f32 MXU).  The chunk output must stay f32:
            # emitting bf16 here made the next conv's feature gather 4-5x
            # slower (trace r5c — XLA's layout for the bf16 concat ruins
            # the row-gather access pattern), costing far more than the
            # halved concat traffic saved.
            if self.compute_dtype == jnp.bfloat16:
                out = jax.lax.dot_general(
                    t.astype(jnp.bfloat16),
                    W.reshape(K, C, self.dim_out).astype(jnp.bfloat16),
                    dimension_numbers=(((3, 4), (0, 1)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                return out + bias
            out = jax.lax.dot_general(
                t, W.reshape(K, C, self.dim_out),
                dimension_numbers=(((3, 4), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out + bias                                    # (B,c,A,Cout)

        # Python-unrolled chunk loop: a lax.map while-loop would serialize
        # chunks with a hard barrier each iteration; straight-line HLO lets
        # XLA overlap one chunk's gathers with another's compute.
        # jax.checkpoint: the (chunk, nn, A, K) weight block is cheap to
        # recompute and far too large (GBs across chunks) to keep as a
        # backward residual.
        do_chunk_r = jax.checkpoint(do_chunk)
        outs = [
            do_chunk_r((idx_c[:, i], ctr_c[:, i])) for i in range(n_chunks)
        ]
        out = jnp.concatenate(outs, axis=1)[:, :P2]
        return SphericalCloud(new_xyz, out), sample_idx


class IntraSO3Conv(nn.Module):
    """Rotation-group conv over the 12-neighbor anchor adjacency
    (reference vgtk modules.py:131-153, functional.py:331-378)."""

    dim_in: int
    dim_out: int
    compute_dtype: Any = None   # bf16 at inference (EtchConfig.use_bfloat16)

    @nn.compact
    def __call__(self, cloud: SphericalCloud) -> SphericalCloud:
        xyz, feats = cloud
        B, P, A, C = feats.shape
        intra_idx = np.asarray(get_intra_idx())          # (A, 12)
        M = intra_idx.shape[1]
        W = self.param(
            "W", nn.initializers.xavier_uniform(), (M * C, self.dim_out), feats.dtype
        )
        bias = self.param(
            "bias", nn.initializers.constant(1e-3), (self.dim_out,), feats.dtype
        )
        # The adjacency gather feats[:, :, intra_idx, :] materializes a 12x
        # blown-up (B,P,A,12,C) tensor at gather speed (~5 ms/conv measured).
        # Instead fold the gather into the weight matmul: out[b,p,a,o] =
        # sum_{a',c} feats[b,p,a',c] * W2[a'*C+c, a*O+o] with the block-
        # sparse W2[a'C+c, aO+o] = sum_m [intra_idx[a,m]==a'] W[mC+c, o] —
        # one MXU-shaped (A*C -> A*O) matmul per point, no gather at all
        # (trades 5x FLOPs on zero blocks for gather-free bandwidth).
        O = self.dim_out
        W3 = W.reshape(M, C, O)
        # W4[a, a', c, o] = sum_m [intra_idx[a, m] == a'] W3[m, c, o]
        # (built by a tiny scatter-add over the traced param — NOT a folded
        # (A*C, A, M*C) selection constant, which would be ~180 MB)
        W4 = jnp.zeros((A, A, C, O), dtype=W.dtype)
        W4 = W4.at[np.arange(A)[:, None], intra_idx].add(W3[None])
        W2 = jnp.transpose(W4, (1, 2, 0, 3)).reshape(A * C, A * O)
        # bf16 operands at inference, f32 accumulation: the blown-up
        # (A*C x A*O) matmul is ~150 GFLOP per conv and FLOP-bound in f32
        # (profiled 4.7 ms); training keeps f32 operands (reference trains
        # with TF32 off, train.py:23).
        cdt = self.compute_dtype or feats.dtype
        out = jax.lax.dot_general(
            feats.reshape(B, P, A * C).astype(cdt),
            W2.astype(cdt),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(B, P, A, self.dim_out) + bias
        return SphericalCloud(xyz, out)


class PointnetSO3Conv(nn.Module):
    """Equivariant PointNet global pooling (reference vgtk modules.py:156-191;
    part of the EPN model zoo, not on ETCH's main path — rebuilt for inventory
    completeness): concat anchor-rotated centered coordinates to the features,
    embed with a 1x1 conv, max-pool over points (or anchors)."""

    dim_in: int
    dim_out: int

    @nn.compact
    def __call__(self, cloud: SphericalCloud, pool_anchors: bool = False) -> Array:
        xyz, feats = cloud
        B, P, A, C = feats.shape
        anchors = jnp.asarray(get_anchors(A), dtype=xyz.dtype)
        centered = xyz - jnp.mean(xyz, axis=1, keepdims=True)
        # anchor-frame coordinates: (B, P, A, 3)
        xyzr = jnp.einsum("aji,bpj->bpai", anchors, centered)
        h = jnp.concatenate([feats, xyzr], axis=-1)
        h = nn.Dense(self.dim_out, name="embed")(h)
        axis = 2 if pool_anchors else 1
        return jnp.max(h, axis=axis)  # (B, P, C) or (B, A, C)


class KernelPropagation(nn.Module):
    """Occupancy-style initial conv from a raw fragment onto sampled centers
    (reference vgtk modules.py:41-86 + the initial_anchor_query CUDA kernel,
    grouping_cuda_kernel.cu:117-180; part of the EPN model zoo, never
    constructed by an ETCH entry point — rebuilt for inventory completeness).

    For every fragment point within `radius` of a center, every anchor-rotated
    kernel point accumulates relu(1 - d^2/sigma); counts of in-radius points
    normalize as wts / (count + 1).  A (K -> dim_out) 1x1 conv (BasicSO3Conv)
    embeds the per-(center, anchor) kernel occupancy.
    """

    dim_out: int
    n_center: int
    kernel_size: int
    radius: float
    sigma: float
    n_anchor: int = 60
    chunk: int = 4096     # fragment points per streamed step

    @nn.compact
    def __call__(self, frag: Array, clouds: Array) -> SphericalCloud:
        """frag: (M, 3) raw fragment; clouds: (B, P, 3) -> SphericalCloud
        with feats (B, n_center, A, dim_out)."""
        kernels = get_kernel_points(self.radius, self.kernel_size)   # (K, 3)
        anchors = get_anchors(self.n_anchor)
        A, K = self.n_anchor, kernels.shape[0]
        rk = jnp.asarray(
            np.einsum("aij,kj->kai", anchors, kernels).reshape(K * A, 3),
            dtype=frag.dtype,
        )

        B, P, _ = clouds.shape
        if P == self.n_center:
            centers = clouds
        else:
            centers = gather_points(clouds, fps(clouds, self.n_center))
        M = frag.shape[0]
        pad = (-M) % self.chunk
        fr = jnp.pad(frag, ((0, pad), (0, 0))).reshape(-1, self.chunk, 3)
        valid = jnp.pad(jnp.ones((M,), frag.dtype),
                        ((0, pad),)).reshape(-1, self.chunk)

        def body(carry, args):
            wts, ctn = carry
            x, v = args                                   # (chunk,3),(chunk,)
            # (B, nc, chunk) center->fragment distances
            diff = centers[:, :, None, :] - x[None, None, :, :]
            inball = (
                jnp.sqrt(jnp.sum(diff * diff, axis=-1)) <= self.radius
            ).astype(frag.dtype) * v[None, None, :]
            # (B, nc, chunk, K*A) kernel-point weights
            d = diff[:, :, :, None, :] + rk[None, None, None, :, :]
            w = jax.nn.relu(1.0 - jnp.sum(d * d, axis=-1) / self.sigma)
            wts = wts + jnp.einsum(
                "bncs,bnc->bns", w, inball
            ).reshape(B, self.n_center, K, A)
            ctn = ctn + jnp.sum(inball, axis=-1)[..., None, None]
            return (wts, ctn), None

        init = (
            jnp.zeros((B, self.n_center, K, A), frag.dtype),
            jnp.zeros((B, self.n_center, 1, 1), frag.dtype),
        )
        (wts, ctn), _ = jax.lax.scan(body, init, (fr, valid))
        wts = wts / (ctn + 1.0)                           # (B, nc, K, A)

        W = self.param(
            "W", nn.initializers.xavier_uniform(), (K, self.dim_out),
            frag.dtype,
        )
        bias = self.param(
            "bias", nn.initializers.constant(1e-3), (self.dim_out,),
            frag.dtype,
        )
        feats = jnp.einsum("bnka,ko->bnao", wts, W) + bias
        return SphericalCloud(centers, feats)


class SeparableSO3ConvBlock(nn.Module):
    """inter-conv -> intra-conv with normalized skip connection
    (reference src/models/so3conv.py:145-183)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    radius: float
    sigma: float
    n_neighbor: int
    lazy_sample: bool
    occupancy_input: bool = False
    negative_slope: float = 0.01  # torch leaky_relu default
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, cloud: SphericalCloud):
        skip_feats = cloud.feats
        inter = InterSO3Conv(
            dim_in=self.dim_in,
            dim_out=self.dim_out,
            kernel_size=self.kernel_size,
            stride=self.stride,
            radius=self.radius,
            sigma=self.sigma,
            n_neighbor=self.n_neighbor,
            lazy_sample=self.lazy_sample,
            occupancy_input=self.occupancy_input,
            compute_dtype=self.compute_dtype,
            name="inter",
        )
        x, sample_idx = inter(cloud)
        h = InstanceNormPA(name="inter_norm")(x.feats)
        h = nn.leaky_relu(h, self.negative_slope)
        x = SphericalCloud(x.xyz, h)

        x2 = IntraSO3Conv(
            dim_in=self.dim_out, dim_out=self.dim_out,
            compute_dtype=self.compute_dtype, name="intra",
        )(x)
        h = InstanceNormPA(name="intra_norm")(x2.feats)
        h = nn.leaky_relu(h, self.negative_slope)

        if self.stride > 1:
            skip_feats = gather_points(skip_feats, sample_idx)
        skip = nn.Dense(self.dim_out, use_bias=True, name="skip_conv")(skip_feats)
        skip = InstanceNormPA(name="skip_norm")(skip)
        skip = nn.leaky_relu(skip, self.negative_slope)

        return SphericalCloud(x2.xyz, h + skip), sample_idx


class EPNBackbone(nn.Module):
    """Stack of separable SO(3) conv blocks (reference so3net.py:10-33 +
    build_model schedule so3net.py:36-152; static plan precomputed by
    etch_tpu.utils.config.backbone_plan)."""

    plan: Any  # tuple of blocks, each a tuple of conv descriptor dicts
    compute_dtype: Any = None  # bf16 inference dtype for FLOP-bound matmuls

    @nn.compact
    def __call__(self, xyz: Array):
        """xyz: (B, P, 3) -> SphericalCloud with feats (B, P', 60, C_last)."""
        cloud = SphericalCloud(xyz, occupancy_features(xyz))
        sample_idx_lists = []
        for bi, block in enumerate(self.plan):
            block_idx = []
            for ci, conv in enumerate(block):
                blk = SeparableSO3ConvBlock(
                    dim_in=conv.dim_in,
                    dim_out=conv.dim_out,
                    kernel_size=conv.kernel_size,
                    stride=conv.stride,
                    radius=conv.radius,
                    sigma=conv.sigma,
                    n_neighbor=conv.n_neighbor,
                    lazy_sample=conv.lazy_sample,
                    occupancy_input=conv.occupancy_input,
                    compute_dtype=self.compute_dtype,
                    name=f"block{bi}_conv{ci}",
                )
                cloud, sample_idx = blk(cloud)
                block_idx.append(sample_idx)
            sample_idx_lists.append(block_idx)
        return cloud, sample_idx_lists
