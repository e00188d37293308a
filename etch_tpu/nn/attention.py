"""Anchor-axis self-attention stack for the direction head.

Rebuild of reference `src/models/direction_backbones.py` (BatchMLP :37-76,
MultiHeadAttention :129-194, StackedMHSA :197-223) as flax modules operating
on (batch*points, 60 anchors, C) tensors.  The per-point attention over the
60 anchor channels is a batched 60x60 attention — small matrices, so the win
on TPU comes from batching all B*N points into one fused attention kernel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


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

    @nn.compact
    def __call__(self, x):  # (B, L, E) self-attention
        E, H = self.embedding_dim, self.num_heads
        hs = E // H
        q = nn.Dense(E, use_bias=False, name="query")(x)
        k = nn.Dense(E, use_bias=False, name="key")(x)
        v = nn.Dense(E, use_bias=False, name="value")(x)

        B, L, _ = x.shape
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
