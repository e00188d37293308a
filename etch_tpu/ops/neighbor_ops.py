"""Neighbor subtraction and weighted aggregation ops.

Completes the pointops surface: the reference ships CUDA kernels for these
(`external/pointops/src/subtraction/subtraction_cuda_kernel.cu:5-30`,
`external/pointops/src/aggregation/aggregation_cuda_kernel.cu:5-53`, wrapped
at `src/models/pointops.py:103-161`) even though the main ETCH path computes
the equivalent inline; provided here as named batched ops so code written
against pointops has direct equivalents.

Semantics (dense-batched):
  subtraction: out[b,i,j,c] = input1[b,i,c] - input2[b,idx[b,i,j],c]
  aggregation: out[b,i,c]  = sum_j (input[b,idx[b,i,j],c] + position[b,i,j,c])
                              * weight[b,i,j,c mod w_c]
(the modulo weight-channel indexing implements share_planes grouping exactly
as the CUDA kernel's `c_idx % w_c`).
"""

from __future__ import annotations

import jax.numpy as jnp

from etch_tpu.ops.grouping import group_points


def neighbor_subtraction(
    input1: jnp.ndarray,   # (B, N, C)
    input2: jnp.ndarray,   # (B, N, C)
    idx: jnp.ndarray,      # (B, N, K)
) -> jnp.ndarray:
    """(B, N, K, C) per-neighbor differences."""
    grouped = group_points(input2, idx)
    return input1[:, :, None, :] - grouped


def neighbor_aggregation(
    inputs: jnp.ndarray,    # (B, N, C)
    position: jnp.ndarray,  # (B, N, K, C)
    weight: jnp.ndarray,    # (B, N, K, Wc), Wc divides C
    idx: jnp.ndarray,       # (B, N, K)
) -> jnp.ndarray:
    """(B, N, C) weighted aggregation with grouped (share_planes) weights."""
    B, N, K, C = position.shape
    Wc = weight.shape[-1]
    assert C % Wc == 0, "weight channels must divide feature channels"
    grouped = group_points(inputs, idx)               # (B, N, K, C)
    w_full = jnp.tile(weight, (1, 1, 1, C // Wc))     # c -> c % Wc mapping
    return jnp.sum((grouped + position) * w_full, axis=2)
