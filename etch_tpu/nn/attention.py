"""Anchor-axis self-attention stack for the direction head.

Rebuild of reference `src/models/direction_backbones.py` (BatchMLP :37-76,
MultiHeadAttention :129-194, StackedMHSA :197-223) as flax modules operating
on (batch*points, 60 anchors, C) tensors.  The per-point attention over the
60 anchor channels is a batched 60x60 attention — small matrices, so the win
on TPU comes from batching all B*N points into one fused attention kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BatchMLP(nn.Module):
    """Linear -> ReLU -> Linear (reference direction_backbones.py:37-76)."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_features)(x)
        x = nn.relu(x)
        return nn.Dense(self.out_features)(x)


class MultiHeadAttention(nn.Module):
    """MHA with separate output size (reference direction_backbones.py:129-194).

    embedding_dim must be divisible by num_heads; value projection stays at
    embedding_dim and `head_combine` maps to value_dim.
    """

    embedding_dim: int
    value_dim: int
    num_heads: int
    packed: bool | None = None  # None = auto (packed when L and hs are small)

    @nn.compact
    def __call__(self, x):  # (B, L, E) self-attention
        E, H = self.embedding_dim, self.num_heads
        hs = E // H
        q = nn.Dense(E, use_bias=False, name="query")(x)
        k = nn.Dense(E, use_bias=False, name="key")(x)
        v = nn.Dense(E, use_bias=False, name="value")(x)

        B, L, _ = x.shape
        use_packed = (
            (L <= 128 and hs < 32) if self.packed is None else self.packed
        )
        if use_packed:
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
            mask = np.zeros((E, H), np.float32)
            for h in range(H):
                mask[h * hs:(h + 1) * hs, h] = 1.0
            scale = 1.0 / float(np.sqrt(hs))
            cdt = jnp.bfloat16
            qb = (q * scale).astype(cdt)
            k2 = (k[:, :, :, None] * jnp.asarray(mask, cdt)[None, None]
                  ).astype(cdt)                                # (B,L,E,H)
            logits = jax.lax.dot_general(
                qb, k2,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                   # (B,q,k,H)
            attn = nn.softmax(logits, axis=2).astype(cdt)
            v2 = (v[:, :, :, None] * jnp.asarray(mask, cdt)[None, None]
                  ).astype(cdt)                                # (B,k,E,H)
            out = jax.lax.dot_general(
                attn, v2,
                dimension_numbers=(((2, 3), (1, 3)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)                                   # (B,q,E)
            return nn.Dense(self.value_dim, name="head_combine")(out)

        def split(t):
            return t.reshape(B, L, H, hs).transpose(0, 2, 1, 3)  # (B,H,L,hs)

        qh, kh, vh = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
            jnp.asarray(hs, x.dtype)
        )
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        return nn.Dense(self.value_dim, name="head_combine")(out)


class StackedMHSA(nn.Module):
    """num_layers of self-attention with residuals on all but the last
    (reference direction_backbones.py:197-223)."""

    embedding_dim: int
    value_dim: int
    num_heads: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for n in range(self.num_layers):
            last = n == self.num_layers - 1
            out_dim = self.value_dim if last else self.embedding_dim
            y = MultiHeadAttention(
                embedding_dim=self.embedding_dim,
                value_dim=out_dim,
                num_heads=self.num_heads,
                name=f"mha{n}",
            )(x)
            x = y if last else x + y
        return x
