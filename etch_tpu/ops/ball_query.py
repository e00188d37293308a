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


def _repeat_fill(idx: jnp.ndarray, cnt: jnp.ndarray, nsample: int,
                 k_eff: int) -> jnp.ndarray:
    """Reference repeat-fill epilogue (grouping_cuda_kernel.cu:99-112):
    cycle the cnt found indices into the remaining slots; empty ball -> 0.

    idx: (..., k_eff) found indices (misses hold 0); cnt: (...,) hit counts.
    """
    cnt_c = jnp.maximum(jnp.minimum(cnt, k_eff), 1)
    j = jnp.arange(nsample, dtype=jnp.int32)
    j = jnp.broadcast_to(j, cnt.shape + (nsample,))
    wrapped = j % cnt_c[..., None]
    fill = jnp.take_along_axis(idx, jnp.minimum(wrapped, k_eff - 1), axis=-1)
    hit_full = j < cnt_c[..., None]
    first = jnp.take_along_axis(idx, jnp.minimum(j, k_eff - 1), axis=-1)
    return jnp.where(hit_full, first, fill)


def ball_query(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 2048,
):
    """query: (B, M, 3), support: (B, N, 3) -> idx (B, M, nsample) int32."""
    N = support.shape[1]
    # Sort-free Pallas path on TPU (the XLA top_k below lowers to a full
    # per-row sort over N); identical first-k-in-index-order results.
    if N >= 512 and jax.default_backend() == "tpu":
        from etch_tpu.ops import _dispatch
        try:
            from etch_tpu.ops.pallas_knn import ball_query_pallas
            out = ball_query_pallas(
                jax.lax.stop_gradient(query),
                jax.lax.stop_gradient(support), float(radius), nsample,
            )
            _dispatch.record("ball_query", "pallas")
            return out
        except Exception as e:  # trace-time Mosaic/shape failures
            _dispatch.warn_fallback("ball_query", e)
            _dispatch.record("ball_query", "xla")
    return _ball_query_xla(query, support, radius, nsample, chunk)


@functools.partial(jax.jit, static_argnames=("nsample", "chunk"))
def _ball_query_xla(
    query: jnp.ndarray,
    support: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 2048,
):
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
