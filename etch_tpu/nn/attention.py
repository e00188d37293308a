"""Anchor-axis self-attention stack for the direction head.

Rebuild of reference `src/models/direction_backbones.py` (BatchMLP :37-76,
MultiHeadAttention :129-194, StackedMHSA :197-223) as flax modules operating
on (batch*points, 60 anchors, C) tensors.  The per-point attention over the
60 anchor channels is a batched 60x60 attention — small matrices, so the win
on TPU comes from batching all B*N points into one fused attention kernel.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.nn.pallas_attention import fused_attention


class BatchMLP(nn.Module):
    """Linear -> ReLU -> Linear (reference direction_backbones.py:37-76)."""

    out_features: int
    dtype: object = None   # e.g. jnp.bfloat16 compute (params stay f32)

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_features, dtype=self.dtype)(x)


class MultiHeadAttention(nn.Module):
    """MHA with separate output size (reference direction_backbones.py:129-194).

    embedding_dim must be divisible by num_heads; value projection stays at
    embedding_dim and `head_combine` maps to value_dim.
    """

    embedding_dim: int
    value_dim: int
    num_heads: int
    packed: bool | None = None  # None = auto (packed when L and hs are small)
    dtype: object = None        # bf16 compute for the projections

    @nn.compact
    def __call__(self, x):  # (B, L, E) self-attention
        E, H = self.embedding_dim, self.num_heads
        hs = E // H
        q = nn.Dense(E, use_bias=False, name="query", dtype=self.dtype)(x)
        k = nn.Dense(E, use_bias=False, name="key", dtype=self.dtype)(x)
        v = nn.Dense(E, use_bias=False, name="value", dtype=self.dtype)(x)

        B, L, _ = x.shape
        use_packed = (
            (L <= 128 and hs < 32) if self.packed is None else self.packed
        )
        if use_packed:
            if (
                jax.default_backend() == "tpu"
                and self.dtype == jnp.bfloat16
                and os.environ.get("ETCH_ATTENTION_PALLAS", "1") == "1"
            ):
                # bf16 compute only: the kernel casts q/k/v to bf16, which
                # would silently break the strict-f32 training policy (the
                # packed XLA path below really is f32 when dtype is None)
                # Fully-fused VMEM-resident attention (pallas_attention.py):
                # the per-point (H, L, L) probabilities never touch HBM.
                # The phase-structured kernel (tile-wide K2/V2 build, then
                # back-to-back MXU dots, then one tile-wide softmax) measures
                # 40.96 ms vs 60.64 ms for the packed XLA path below per
                # attention layer at production shape (40960, 60, 64) on
                # v5e — the round-1 kernel that interleaved VPU mask-builds
                # between dots lost to XLA (4.3 vs 3.7 ms/chunk); set
                # ETCH_ATTENTION_PALLAS=0 to fall back.
                out = fused_attention(
                    q * (1.0 / float(np.sqrt(hs))), k, v, H, True
                ).astype(x.dtype)
                return nn.Dense(self.value_dim, name="head_combine", dtype=self.dtype)(out)
            # Packed block-diagonal attention.  The per-head contraction
            # depth is hs (= 8 here): "bhqd,bhkd->bhqk" runs the MXU at
            # ~hs/128 utilization and dominated the direction head in
            # profiles (~12 ms per layer per forward).  Pack all H heads
            # into one E-deep matmul instead by expanding K and V with a
            # static 0/1 head mask: K2[b,k,e,h] = k[b,k,e]·[head(e)==h], so
            #   logits[b,q,h,k] = sum_e q[b,q,e] K2[b,k,e,h]
            #   out[b,q,e]      = sum_{h,k} attn[b,q,h,k] V2[b,k,e,h]
            # Off-block zeros cost H x FLOPs, but the contraction is E deep
            # (and 480 deep for the AV dot) — MXU-shaped, bf16 inputs, f32
            # accumulation.
            # Head dim H rides ABOVE k in the logits so the softmax reduces
            # over the minor (lane) dim, and when compute dtype is bf16 the
            # softmax runs on bf16 logits (f32 exp/sum): measured 3.7 vs 4.7
            # (k-minor-of-H) vs 5.6 (plain per-head dots) ms per chunk-layer
            # at (2048, 60, 64).  Compute dtype follows the module config so
            # f32 training really is f32 (TF32-off reference policy).
            mask = np.zeros((E, H), np.float32)
            for h in range(H):
                mask[h * hs:(h + 1) * hs, h] = 1.0
            scale = 1.0 / float(np.sqrt(hs))
            cdt = jnp.dtype(self.dtype) if self.dtype is not None else x.dtype
            maskc = jnp.asarray(mask, cdt)
            qb = (q * scale).astype(cdt)
            k2 = jnp.einsum("bke,eh->bhke", k.astype(cdt), maskc)
            logits = jax.lax.dot_general(
                qb, k2,
                dimension_numbers=(((2,), (3,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(cdt)                                       # (B,q,H,k)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.float32))
            attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
            v2 = jnp.einsum("bke,eh->bhke", v.astype(cdt), maskc)
            out = jax.lax.dot_general(
                attn, v2,
                dimension_numbers=(((2, 3), (1, 2)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)                                   # (B,q,E)
            return nn.Dense(self.value_dim, name="head_combine", dtype=self.dtype)(out)

        def split(t):
            return t.reshape(B, L, H, hs).transpose(0, 2, 1, 3)  # (B,H,L,hs)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(hs, x.dtype)
        )
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        return nn.Dense(self.value_dim, name="head_combine", dtype=self.dtype)(out)


class StackedMHSA(nn.Module):
    """num_layers of self-attention with residuals on all but the last
    (reference direction_backbones.py:197-223)."""

    embedding_dim: int
    value_dim: int
    num_heads: int
    num_layers: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for n in range(self.num_layers):
            last = n == self.num_layers - 1
            out_dim = self.value_dim if last else self.embedding_dim
            y = MultiHeadAttention(
                embedding_dim=self.embedding_dim,
                value_dim=out_dim,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name=f"mha{n}",
            )(x)
            x = y if last else x + y
        return x
