"""k-NN inverse-distance-weighted feature interpolation (upsampling).

Replaces the reference's CUDA interpolation
(`external/pointops/src/interpolation/interpolation_cuda_kernel.cu:5-34`,
python path `src/models/pointops.py:164-178`) and the pure-torch
PointFeatPropagation (`src/models/pointnet2_utils.py:45-74`).

Two weighting conventions exist in the reference:
  - pointops.interpolation: w ~ 1/(sqrt(d2)+1e-8)   (use_sqrt=True)
  - PointFeatPropagation:   w ~ 1/(d2+1e-8)         (use_sqrt=False)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from etch_tpu.ops.knn import knn
from etch_tpu.ops.grouping import gather_points, group_points, materialize_rows


def knn_interpolate(
    src_xyz: jnp.ndarray,
    dst_xyz: jnp.ndarray,
    src_feat: jnp.ndarray,
    k: int = 3,
    use_sqrt: bool = True,
    idx_dist=None,
) -> jnp.ndarray:
    """src_xyz: (B, S, 3), dst_xyz: (B, N, 3), src_feat: (B, S, C) -> (B, N, C).

    idx_dist: optional precomputed knn(dst_xyz, src_xyz, k) result — callers
    that interpolate several feature sets over the same geometry (the two
    U-Net heads) share one query.
    """
    if idx_dist is None:
        idx, dist = knn(dst_xyz, src_xyz, k)      # (B, N, k)
    else:
        idx, dist = idx_dist
    if use_sqrt:
        w = 1.0 / (dist + 1e-8)
    else:
        w = 1.0 / (dist * dist + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    # k separate row gathers + fused multiply-add instead of one (B, N*k)
    # gather: the single big gather's (B,N,k,C) output forces a physical
    # retile before the weighted reduce (profiled 3.3 ms reshape + 3.4 ms
    # multiply_reduce at the EPN->5000pt propagation); per-k row gathers
    # write (B,N,C) in final layout and the w-scaled add fuses into each.
    src2 = materialize_rows(src_feat)
    out = None
    for j in range(idx.shape[-1]):
        g = gather_points(src2, idx[..., j]) * w[..., j:j + 1]
        out = g if out is None else out + g
    return out
