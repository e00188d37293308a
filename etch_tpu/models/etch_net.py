"""Top-level ETCH network: EPN encoder + direction/magnitude/confidence heads.

Rebuild of reference `src/models/models_pointcloud.py:18-221`
(GT_network_equiv).  Input is a batch of scans (B, N, 3); outputs are
per-point tightness direction (B, N, 3, unit), magnitude (B, N, 1, scaled
x10), 86-way part logits (B, N, 86) and confidence (B, N, 1).

The predicted tightness vector is direction * magnitude / scale_magnitude and
the "etched" inner point is hitpts - vector (reference src/eval.py:116,183).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import os

from etch_tpu.geometry import get_anchors
from etch_tpu.geometry.so3 import project_to_so3
from etch_tpu.nn.epn import EPNBackbone
from etch_tpu.nn.pallas_attention import fused_attention, packed_attention
from etch_tpu.nn.pallas_dircore import (direction_core_pallas,
                                        direction_core_ref)
from etch_tpu.nn.point_transformer import PointTransformerSeg, unet_geometry
from etch_tpu.ops import knn_interpolate
from etch_tpu.utils.config import EtchConfig, backbone_plan

Array = jnp.ndarray


from etch_tpu.nn.epn import ConvSpec


def _freeze_plan(plan):
    return tuple(tuple(ConvSpec(**c) for c in block) for block in plan)


class DirectionHead(nn.Module):
    """Anchor-attention direction decoder
    (reference models_pointcloud.py:52-54,111-126).

    Per point: MHSA over the 60 anchor channels -> MLP -> scalar anchor
    weights -> weighted chordal mean of the anchor rotations -> rotate the
    canonical vector [0,0,1].

    The core's parameters are declared explicitly so that inference on
    TPU/bf16 runs the ENTIRE per-point core (QKV, both attention layers,
    head_combine, BatchMLP, so3_reg) as one fused Pallas kernel
    (nn/pallas_dircore.py) while training keeps the chunked, remat'd scan
    over the same weights (its (chunk, H, A, A) attention logits dominate
    backward memory at full scale).
    """

    embed_dim: int
    value_dim: int = 128
    num_heads: int = 8
    num_layers: int = 2
    chunk: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, equiv_feat: Array, train: bool = False) -> Array:
        # equiv_feat: (B, N, A, C)
        B, N, A, C = equiv_feat.shape
        E, V = self.embed_dim, self.value_dim
        L = self.num_layers
        lecun = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        params = {}
        for l in range(L):
            for nm in ("wq", "wk", "wv"):
                params[f"{nm}{l}"] = self.param(f"{nm}{l}", lecun, (E, E))
            out_d = V if l == L - 1 else E
            params[f"wc{l}"] = self.param(f"wc{l}", lecun, (E, out_d))
            params[f"bc{l}"] = self.param(f"bc{l}", zeros, (out_d,))
        params["wm0"] = self.param("wm0", lecun, (V, V))
        params["bm0"] = self.param("bm0", zeros, (V,))
        params["wm1"] = self.param("wm1", lecun, (V, V))
        params["bm1"] = self.param("bm1", zeros, (V,))
        params["wr"] = self.param("wr", lecun, (V, 1))
        params["br"] = self.param("br", zeros, (1,))

        x = equiv_feat.reshape(B * N, A, C)
        # cast the tokens to the head's compute dtype up front: the scan
        # carries the full (n_chunks, chunk, A, C) stack through HBM
        # (~630 MB f32 at production shape); the f32-sensitive tail
        # (so3_reg + chordal mean) upcasts internally.
        if self.dtype is not None:
            x = x.astype(self.dtype)
        M = B * N

        use_kernel = (
            not train
            and self.num_layers == 2   # fused core specializes to 2 layers
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.bfloat16
            and os.environ.get("ETCH_DIRCORE_PALLAS", "1") == "1"
        )
        if use_kernel:
            w = direction_core_pallas(
                x, params, self.num_heads,
                tile=int(os.environ.get("ETCH_DIRCORE_TILE", "24")),
            )                                                      # (M, A)
        else:
            # chunk over points to bound the (chunk, H, A, A) attention
            # logits; jax.checkpoint drops them from backward residuals
            use_pallas_attn = (
                not train
                and jax.default_backend() == "tpu"
                and self.dtype == jnp.bfloat16
                and os.environ.get("ETCH_ATTENTION_PALLAS", "1") == "1"
            )
            if use_pallas_attn:
                attn = lambda q, k, v, H: fused_attention(q, k, v, H, True)
            else:
                attn = packed_attention
            chunk = min(self.chunk, M)
            pad = (-M) % chunk
            xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))).reshape(
                -1, chunk, A, C)
            body = jax.checkpoint(
                lambda tok: direction_core_ref(
                    tok, params, self.num_heads, attn=attn))
            _, w_chunks = jax.lax.scan(
                lambda carry, tok: (carry, body(tok)), 0, xp)
            w = w_chunks.reshape(-1, A)[:M]      # (M, A) f32 anchor weights
        # weighted chordal mean over ALL points at once: C = w @ anchors as
        # ONE (M, A)@(A, 9) MXU matmul, then a single batched SO(3)
        # projection — vs 20 per-chunk tiny-batch 4x4 programs in the scan
        anchors = jnp.asarray(get_anchors(A), jnp.float32)   # (A, 3, 3)
        C = (w @ anchors.reshape(A, 9)).reshape(M, 3, 3)
        R = project_to_so3(C)
        return R[..., :, 2].reshape(B, N, 3)     # R @ [0,0,1] == third column


class EtchNet(nn.Module):
    """GT_network_equiv equivalent (reference models_pointcloud.py:18-221)."""

    cfg: EtchConfig

    def setup(self):
        plan = _freeze_plan(backbone_plan(self.cfg))
        self.plan = plan
        enc_dtype = jnp.bfloat16 if self.cfg.use_bfloat16 else None
        self.encoder = EPNBackbone(
            plan=plan, compute_dtype=enc_dtype, name="encoder"
        )
        self.epn_feat_dim = plan[-1][-1].dim_out

        head_dtype = jnp.bfloat16 if self.cfg.use_bfloat16 else None
        self.direction_head = DirectionHead(
            embed_dim=self.epn_feat_dim,
            value_dim=self.cfg.dir_value_dim,
            num_heads=self.cfg.dir_num_heads,
            num_layers=self.cfg.dir_num_layers,
            chunk=self.cfg.dir_chunk,
            dtype=head_dtype,
            name="direction_head",
        )
        self.magnitude_head = PointTransformerSeg(
            mode="magnitude",
            planes=self.cfg.unet_planes_magnitude,
            blocks=self.cfg.unet_blocks,
            strides=self.cfg.unet_strides,
            nsamples=self.cfg.unet_nsamples,
            dtype=head_dtype,
            name="magnitude_encoder",
        )
        self.confidence_head = PointTransformerSeg(
            mode="confidence",
            num_classes=self.cfg.num_markers,
            planes=self.cfg.unet_planes_confidence,
            blocks=self.cfg.unet_blocks,
            strides=self.cfg.unet_strides,
            nsamples=self.cfg.unet_nsamples,
            dtype=head_dtype,
            name="confidence_encoder",
        )

    def __call__(
        self,
        hitpts: Array,
        train: bool = False,
        pred_items: Sequence[str] = ("confidence", "direction", "magnitude"),
    ):
        """hitpts: (B, N, 3) -> dict of per-point predictions."""
        B, N, _ = hitpts.shape
        cloud, _ = self.encoder(hitpts)
        feats = cloud.feats                              # (B, K, A, C)
        K, A, C = feats.shape[1], feats.shape[2], feats.shape[3]

        # 3-NN feature propagation back to all N input points with
        # squared-distance IDW (reference pointnet2_utils.py:45-74).
        # The (c, a)-ordered flatten + explicit transpose for the direction
        # tokens looks redundant but is the FAST form: flattening (a, c)
        # instead (tried, round 5) moves the layout change into an implicit
        # reshape of the prop output that XLA lowers as a slower relayout +
        # convert (+13 ms on the direction stage at B=8, trace r5c).
        flat = feats.transpose(0, 1, 3, 2).reshape(B, K, C * A)
        prop = knn_interpolate(cloud.xyz, hitpts, flat, k=3, use_sqrt=False)
        point_equiv = prop.reshape(B, N, C, A)           # (B, N, C, A)
        point_inv = jnp.mean(point_equiv, axis=-1)       # (B, N, C)

        results = {}
        # "equiv" exposes the propagated per-point invariant features — an
        # exact prefix of the production program, used by the stage profiler
        # (without it an encoder-only program is fully dead-code-eliminated)
        if "equiv" in pred_items:
            results["equiv"] = point_inv
        # the two U-Net heads share identical trunk geometry over the same
        # cloud — compute FPS/kNN/interpolation queries once for both
        geom = None
        if "confidence" in pred_items or "magnitude" in pred_items:
            geom = unet_geometry(
                hitpts, self.cfg.unet_strides, self.cfg.unet_nsamples
            )
        if "confidence" in pred_items:
            logits, conf = self.confidence_head(
                hitpts, point_inv, train=train, geom=geom
            )
            results["part_labels"] = logits.astype(jnp.float32)
            results["confidences"] = conf.astype(jnp.float32)
        if "direction" in pred_items:
            equiv = point_equiv.transpose(0, 1, 3, 2)    # (B, N, A, C)
            results["direction"] = self.direction_head(equiv, train=train)
        if "magnitude" in pred_items:
            results["magnitude"] = self.magnitude_head(
                hitpts, point_inv, train=train, geom=geom
            ).astype(jnp.float32)
        return results

    def predict_vectors(self, results) -> Array:
        """Tightness vectors from head outputs (reference eval.py:116)."""
        return (
            results["direction"]
            * results["magnitude"]
            / self.cfg.scale_magnitude
        )
