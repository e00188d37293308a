"""Confidence-weighted sparse marker extraction from labeled inner points.

Vectorized replacement for the reference's B x 86 python loop
(`src/models/fit_SMPL.py:17-62`): per batch item and marker label, take the
top-3 points by confidence among points predicted with that label, weight them
by confidence^20 and average.  A label with no points is invalid.

TPU design: one (B, L, K) masked score tensor, top_k over K, masked weighted
mean — no loops, no ragged shapes.  Weights are normalized by the per-group
max before the ^20 power (mathematically identical — the weighted mean is
scale-invariant — but cannot underflow the way raw conf^20 can).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ALPHA = 20.0  # reference fit_SMPL.py:53


@functools.partial(jax.jit, static_argnames=("num_markers", "top_k"))
def extract_markers(
    inner_points: jnp.ndarray,   # (B, K, 3)
    part_labels: jnp.ndarray,    # (B, K) int
    confidences: jnp.ndarray,    # (B, K, 1) or (B, K)
    num_markers: int = 86,
    top_k: int = 3,
):
    """Returns (markers (B, L, 3), valid (B, L) bool)."""
    if confidences.ndim == 3:
        confidences = confidences[..., 0]
    B, K, _ = inner_points.shape
    L = num_markers

    onehot = part_labels[:, None, :] == jnp.arange(L, dtype=part_labels.dtype)[None, :, None]
    neg = jnp.finfo(confidences.dtype).min
    scores = jnp.where(onehot, confidences[:, None, :], neg)     # (B, L, K)

    # top-k by iterative argmax: k=3 masked argmax passes are ~10x cheaper
    # than jax.lax.top_k, which lowers to a FULL (B, L, K) sort on TPU
    # (3.6 ms at production shape); ties resolve to the lowest index in both.
    vals, idxs = [], []
    s = scores
    lanes = jnp.arange(K, dtype=jnp.int32)
    for _ in range(top_k):
        i = jnp.argmax(s, axis=-1)                               # (B, L)
        vals.append(jnp.take_along_axis(s, i[..., None], -1)[..., 0])
        idxs.append(i)
        s = jnp.where(lanes == i[..., None], neg, s)
    top_vals = jnp.stack(vals, -1)                               # (B, L, t)
    top_idx = jnp.stack(idxs, -1).astype(jnp.int32)              # (B, L, t)
    hit = top_vals > neg / 2                                      # real members
    # gather the points with flat (L*t) indices per batch item — indexing the
    # L-fold repeated cloud would materialize a (B, L, K, 3) intermediate
    pts = jnp.take_along_axis(
        inner_points,
        top_idx.reshape(B, L * top_k, 1).repeat(3, -1),
        axis=1,
    ).reshape(B, L, top_k, 3)

    # stable confidence^alpha weights: divide by the max |conf| in the group
    # first (invariant under the weighted mean), then power.
    cmax = jnp.max(jnp.where(hit, jnp.abs(top_vals), 0.0), axis=-1, keepdims=True)
    safe = jnp.where(cmax > 0, cmax, 1.0)
    w = jnp.where(hit, (top_vals / safe) ** ALPHA, 0.0)          # (B, L, t)

    wsum = jnp.sum(w, axis=-1, keepdims=True)
    centers = jnp.sum(pts * w[..., None], axis=2) / jnp.where(
        wsum > 0, wsum, 1.0
    )
    valid = jnp.any(hit, axis=-1)                                # (B, L)
    centers = jnp.where(valid[..., None], centers, 0.0)
    return centers, valid
