"""Batched gather / grouping ops.

On GPU the reference needs custom gather/scatter-add kernels
(`external/pointops/src/grouping/grouping_cuda_kernel.cu:5-27`,
`external/vgtk/vgtk/cuda/gathering_cuda_kernel.cu:43-103`); on TPU XLA's
native gather/scatter lowering (and its transpose for the backward pass) is
already optimal, so these are thin jnp compositions kept as named ops for
parity and testability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, ...), idx: (B, M) -> (B, M, ...).

    Implemented as a per-batch row gather (vmap of f[i]) rather than
    take_along_axis: the latter's trailing broadcast dims lower to an
    element-wise XLA gather (slice size 1), which is ~10x slower on TPU than
    gathering whole (...,) feature rows per index.
    """
    return jax.vmap(lambda f, i: f[i])(feats, idx)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, C...), idx: (B, M, K) -> (B, M, K, C...)."""
    B, M, K = idx.shape
    flat = gather_points(feats, idx.reshape(B, M * K))
    return flat.reshape((B, M, K) + feats.shape[2:])
