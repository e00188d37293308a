"""Point-to-mesh distance in JAX (differentiable).

Rebuild of the one live definition in reference `src/utils/customized_losses.py`
(`my_point_mesh_face_distance`, the optional point-mesh term of the fitting
objective, fit_SMPL.py:103-109).  Exact point-to-triangle distance (Ericson
regions), vectorized over a face-candidate set selected by a coarse centroid
kNN so the cost is O(P * k) instead of O(P * F).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from etch_tpu.ops.knn import knn


def _point_triangle_dist2(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """p: (..., 3); tri: (..., 3, 3) -> squared distance (...,)."""
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = jnp.where(jnp.abs(va + vb + vc) < 1e-30, 1.0, va + vb + vc)
    v_int = vb / denom
    w_int = vc / denom
    cp_int = a + v_int[..., None] * ab + w_int[..., None] * ac

    def _safe(x, y):
        return x / jnp.where(jnp.abs(y) < 1e-30, 1.0, y)

    cp_ab = a + _safe(d1, d1 - d3)[..., None] * ab
    cp_ac = a + _safe(d2, d2 - d6)[..., None] * ac
    wbc = _safe(d4 - d3, (d4 - d3) + (d5 - d6))
    cp_bc = b + wbc[..., None] * (c - b)

    out = cp_int
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], cp_ac, out)
    out = jnp.where(
        ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None], cp_bc, out
    )
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], cp_ab, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    return jnp.sum((out - p) ** 2, -1)


@functools.partial(jax.jit, static_argnames=("k",))
def point_mesh_distance(
    points: jnp.ndarray,    # (B, P, 3)
    vertices: jnp.ndarray,  # (B, V, 3)
    faces: jnp.ndarray,     # (F, 3) int (shared topology)
    k: int = 8,
) -> jnp.ndarray:
    """Exact distance from each point to the nearest of its k candidate faces
    (candidates by face-centroid kNN).  Returns (B, P)."""
    tri = vertices[:, faces]                       # (B, F, 3, 3)
    centroids = tri.mean(axis=2)                   # (B, F, 3)
    idx, _ = knn(points, centroids, k)             # (B, P, k)
    cand = jnp.take_along_axis(
        tri[:, None].repeat(points.shape[1], 1),
        idx[..., None, None].repeat(3, -2).repeat(3, -1),
        axis=2,
    )                                              # (B, P, k, 3, 3)
    d2 = _point_triangle_dist2(points[:, :, None, :], cand)
    return jnp.sqrt(jnp.min(d2, axis=-1))
