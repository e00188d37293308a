"""Radius (ball) query with the reference's repeat-fill semantics.

Replaces `external/vgtk/vgtk/cuda/grouping_cuda_kernel.cu:68-116` (wrapped at
`external/vgtk/vgtk/pc/sample.py:58-71`): for each query point take the first
`nsample` support indices (in index order) with squared distance strictly
inside radius^2; if fewer than nsample are found, repeat the found indices
cyclically; a completely empty ball yields index 0.

TPU design: no scan loop — a masked top-k over (n - index) gives "the k
smallest indices satisfying the mask" in one vectorized pass per query tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 2048,
):
    """query: (B, M, 3), support: (B, N, 3) -> idx (B, M, nsample) int32."""
    B, M, _ = query.shape
    N = support.shape[1]
    r2 = jnp.asarray(radius, query.dtype) ** 2

    def one_batch(q, s):
        pad = (-M) % chunk
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        qc = qp.reshape(-1, chunk, 3)
        rev_iota = jnp.arange(N, 0, -1, dtype=jnp.int32)  # N..1, descending

        def do_chunk(qt):
            qq = jnp.sum(qt * qt, axis=-1, keepdims=True)
            ss = jnp.sum(s * s, axis=-1)[None, :]
            d2 = qq + ss - 2.0 * jax.lax.dot(
                qt, s.T, precision=jax.lax.Precision.HIGHEST
            )                                             # (chunk, N)
            mask = d2 < r2
            # top-k of (N - i) under the mask == the k smallest indices
            # inside the ball, emitted in ascending index order.
            k_eff = min(nsample, N)
            scores = jnp.where(mask, rev_iota[None, :], 0)
            vals, _ = jax.lax.top_k(scores, k_eff)        # descending scores
            hit = vals > 0
            idx = jnp.where(hit, N - vals, 0).astype(jnp.int32)
            cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (chunk,)
            cnt_c = jnp.maximum(jnp.minimum(cnt, k_eff), 1)
            j = jnp.arange(nsample, dtype=jnp.int32)[None, :]
            wrapped = j % cnt_c[:, None]                   # (chunk, nsample)
            fill = jnp.take_along_axis(
                idx, jnp.minimum(wrapped, k_eff - 1), axis=1
            )
            hit_full = j < cnt_c[:, None]
            first = jnp.take_along_axis(idx, jnp.minimum(j, k_eff - 1), axis=1)
            return jnp.where(hit_full, first, fill)

        out = jax.lax.map(do_chunk, qc)
        return out.reshape(-1, nsample)[:M]

    return jax.vmap(one_batch)(query, support)
