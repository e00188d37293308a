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

from etch_tpu.geometry import get_anchors
from etch_tpu.geometry.so3 import project_to_so3
from etch_tpu.nn.attention import BatchMLP, StackedMHSA
from etch_tpu.nn.epn import EPNBackbone
from etch_tpu.nn.point_transformer import PointTransformerSeg, unet_geometry
from etch_tpu.ops import knn_interpolate
from etch_tpu.utils.config import EtchConfig, backbone_plan

Array = jnp.ndarray


from etch_tpu.nn.epn import ConvSpec


def _freeze_plan(plan):
    return tuple(tuple(ConvSpec(**c) for c in block) for block in plan)


class _DirectionCore(nn.Module):
    """Per-chunk direction decoder body (separate module so nn.remat can drop
    its (chunk, heads, 60, 60) attention logits from the backward residuals —
    the dominant training-memory term at full scale).

    Returns the per-point ANCHOR WEIGHTS (chunk, A); the weighted chordal
    mean runs ONCE over the full point batch outside the chunk scan — inside
    the scan its batched 4x4 matrix chains (project_to_so3) ran as 20
    separate tiny-batch programs per forward."""

    embed_dim: int
    value_dim: int
    num_heads: int
    num_layers: int
    dtype: Any = None   # bf16 compute for the attention/MLP stack

    @nn.compact
    def __call__(self, tokens: Array) -> Array:  # (chunk, A, C) -> (chunk, A)
        h = StackedMHSA(
            embedding_dim=self.embed_dim,
            value_dim=self.value_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="direction_encoder",
        )(tokens)
        h = BatchMLP(out_features=self.value_dim, dtype=self.dtype,
                     name="direction_predictor")(h)
        # anchor weights and the chordal mean stay f32: the rotation mean
        # is sensitive to the weight distribution
        return nn.Dense(1, name="so3_reg")(h.astype(jnp.float32))[..., 0]


class _DirectionScanBody(nn.Module):
    """nn.scan body: (carry, chunk tokens) -> (carry, directions)."""

    embed_dim: int
    value_dim: int
    num_heads: int
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, tokens):
        out = _DirectionCore(
            embed_dim=self.embed_dim,
            value_dim=self.value_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="body",
        )(tokens)
        return carry, out


class DirectionHead(nn.Module):
    """Anchor-attention direction decoder
    (reference models_pointcloud.py:52-54,111-126).

    Per point: MHSA over the 60 anchor channels -> MLP -> scalar anchor
    weights -> weighted chordal mean of the anchor rotations -> rotate the
    canonical vector [0,0,1].
    """

    embed_dim: int
    value_dim: int = 128
    num_heads: int = 8
    num_layers: int = 2
    chunk: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, equiv_feat: Array) -> Array:
        # equiv_feat: (B, N, A, C)
        B, N, A, C = equiv_feat.shape
        x = equiv_feat.reshape(B * N, A, C)
        # cast the tokens to the head's compute dtype BEFORE the chunk scan:
        # the scan carries the full (n_chunks, chunk, A, C) stack through HBM
        # (~630 MB f32 at production shape) and the body's first op is a
        # bf16 Dense that would cast per chunk anyway; the f32-sensitive tail
        # (so3_reg + chordal mean) upcasts inside the body.
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # chunk over points to bound the (chunk, H, A, A) attention logits;
        # chunks share the module's params (nn.scan with broadcast params
        # compiles the chunk body ONCE — the previous unrolled python loop
        # emitted ~10 copies of the MHSA HLO into the program).
        M = B * N
        chunk = min(self.chunk, M)
        pad = (-M) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, A, C)
        scan = nn.scan(
            nn.remat(_DirectionScanBody),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            embed_dim=self.embed_dim,
            value_dim=self.value_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="core",
        )
        _, w_chunks = scan(0, xp)                # (n_chunks, chunk, A)
        w = w_chunks.reshape(-1, A)[:M]          # (M, A) f32 anchor weights
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
        # squared-distance IDW (reference pointnet2_utils.py:45-74)
        flat = feats.transpose(0, 1, 3, 2).reshape(B, K, C * A)
        prop = knn_interpolate(cloud.xyz, hitpts, flat, k=3, use_sqrt=False)
        point_equiv = prop.reshape(B, N, C, A)           # (B, N, C, A)
        point_inv = jnp.mean(point_equiv, axis=-1)       # (B, N, C)

        results = {}
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
            results["direction"] = self.direction_head(equiv)
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
