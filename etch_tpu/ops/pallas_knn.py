"""Sort-free neighbor queries as Pallas TPU kernels.

The XLA paths in etch_tpu/ops/{knn,ball_query}.py reach their top-k through
`jax.lax.top_k`, which lowers to a *full sort* of every (query, N) score row —
the dominant cost of the whole query stack at N=5000 (a single `sort`
instruction was ~53 ms/rep in the profile).  The reference CUDA kernels
(`external/pointops/src/knnquery/knnquery_cuda_kernel.cu:21-116`,
`external/vgtk/vgtk/cuda/grouping_cuda_kernel.cu:68-116`) never sort either:
they keep a per-thread heap / scan in index order.

The TPU-native equivalent keeps a (TQ, N) score tile resident in VMEM and
extracts the k results with k vectorized reduction passes — O(k·N) VPU work
instead of O(N log N) sort per row, with zero HBM round-trips in between:

  * kNN: repeat k times {row-min, argmin with smaller-index tiebreak, mask}.
    Identical results to the stable-top_k XLA path.
  * ball query: scores are `index if d² < r² else BIG`; the k smallest masked
    indices are extracted in strictly increasing order, so each pass is a
    single masked row-min against the previous value — no mask update at all.
    Identical results (first-nsample-in-index-order) to the XLA path; the
    repeat-fill epilogue stays outside the kernel (cheap (M, nsample) math).

Both kernels compute squared distances in-kernel from coordinate planes with
direct VPU broadcast-subtract-square — exact f32, no matmul cancellation, so
near-tie ordering matches the reference's direct-difference arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TQ = 128            # query rows per grid step
_BIG_I = 2 ** 30     # "no hit" sentinel for index scores
_PAD_COORD = 1.0e9   # padded support coords -> d^2 ~ 1e18, never selected


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_d2(q, s_ref):
    """q: (TQ, 3) f32 queries; s_ref block (1, 3, Npad) -> d2 (TQ, Npad)."""
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    sx = s_ref[0, 0:1, :]
    sy = s_ref[0, 1:2, :]
    sz = s_ref[0, 2:3, :]
    return (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2


def _knn_kernel(k: int, q_ref, s_ref, idx_ref, d2_ref, d2_s):
    TQ, npad = d2_s.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, npad), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, idx_ref.shape[-1]), 1)

    d2_s[:] = _tile_d2(q_ref[0], s_ref)

    def body(j, carry):
        res_idx, res_d2 = carry
        d2 = d2_s[:]
        # jnp.argmin takes the FIRST minimum — the reference's scan order
        # resolves ties to the smaller index
        amin = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]   # (TQ, 1)
        m = jnp.min(d2, axis=1, keepdims=True)                     # (TQ, 1)
        d2_s[:] = jnp.where(lane == amin, jnp.inf, d2)
        res_idx = jnp.where(out_lane == j, amin, res_idx)
        res_d2 = jnp.where(out_lane == j, m, res_d2)
        return res_idx, res_d2

    res_idx0 = jnp.zeros(idx_ref.shape[1:], jnp.int32)
    res_d20 = jnp.zeros(d2_ref.shape[1:], jnp.float32)
    res_idx, res_d2 = jax.lax.fori_loop(0, k, body, (res_idx0, res_d20))
    idx_ref[0] = res_idx
    d2_ref[0] = res_d2


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(query: jnp.ndarray, support: jnp.ndarray, k: int,
               interpret: bool = False):
    """query (B, M, 3), support (B, N, 3) -> idx (B, M, k) i32, d2 (B, M, k).

    d2 is the exact squared euclidean distance (caller applies sqrt), sorted
    ascending with index tiebreak — bit-matching the XLA knn path.
    """
    B, M, _ = query.shape
    N = support.shape[1]
    m_pad = _round_up(M, _TQ)
    n_pad = _round_up(N, 128)
    k_pad = _round_up(k, 128)

    q = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, m_pad - M), (0, 0)))
    st = jnp.swapaxes(support.astype(jnp.float32), 1, 2)          # (B, 3, N)
    st = jnp.pad(st, ((0, 0), (0, 0), (0, n_pad - N)),
                 constant_values=_PAD_COORD)

    grid = (B, m_pad // _TQ)
    idx, d2 = pl.pallas_call(
        functools.partial(_knn_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TQ, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _TQ, k_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ, k_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, m_pad, k_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_TQ, n_pad), jnp.float32)],
        interpret=interpret,
    )(q, st)
    return idx[:, :M, :k], d2[:, :M, :k]


def _ball_kernel(k_eff: int, nsample: int, r2: float, q_ref, s_ref, idx_ref,
                 score_s):
    TQ, npad = score_s.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, npad), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, idx_ref.shape[-1]), 1)

    d2 = _tile_d2(q_ref[0], s_ref)
    score_s[:] = jnp.where(d2 < r2, lane, _BIG_I)

    def body(j, carry):
        res, prev = carry
        score = score_s[:]
        cur = jnp.min(
            jnp.where(score > prev, score, _BIG_I), axis=1, keepdims=True
        )
        res = jnp.where(out_lane == j, cur, res)
        return res, cur

    res0 = jnp.full(idx_ref.shape[1:], _BIG_I, jnp.int32)
    prev0 = jnp.full((TQ, 1), -1, jnp.int32)
    res, _ = jax.lax.fori_loop(0, k_eff, body, (res0, prev0))

    # repeat-fill epilogue in-kernel (grouping_cuda_kernel.cu:99-112): cycle
    # the cnt found indices into the remaining slots; empty ball -> index 0.
    # The per-row lane permutation is a one-hot masked reduction — cheap on
    # the (TQ, 128) result tile, and it saves an XLA take_along_axis gather
    # (~15 ms at production shapes) outside.
    valid = (res < _BIG_I) & (out_lane < k_eff)
    cnt = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)
    cnt_c = jnp.maximum(jnp.minimum(cnt, k_eff), 1)
    res0v = jnp.where(valid, res, 0)
    wrapped = jnp.where(out_lane < cnt_c, out_lane, out_lane % cnt_c)
    out = jnp.sum(
        jnp.where(
            wrapped[:, None, :] == out_lane[:, :, None], res0v[:, :, None], 0
        ),
        axis=1,
    )
    idx_ref[0] = jnp.where(out_lane < nsample, out, 0)


@functools.partial(jax.jit,
                   static_argnames=("radius", "nsample", "interpret"))
def ball_query_pallas(query: jnp.ndarray, support: jnp.ndarray, radius,
                      nsample: int, interpret: bool = False):
    """Complete ball query (first-nsample-in-index-order + repeat-fill +
    empty-ball->0), bit-matching the XLA path.  Returns (B, M, nsample) i32.
    """
    B, M, _ = query.shape
    N = support.shape[1]
    m_pad = _round_up(M, _TQ)
    n_pad = _round_up(N, 128)
    k_pad = _round_up(nsample, 128)
    k_eff = min(nsample, N)
    r2 = float(radius) ** 2

    q = jnp.pad(query.astype(jnp.float32), ((0, 0), (0, m_pad - M), (0, 0)))
    st = jnp.swapaxes(support.astype(jnp.float32), 1, 2)
    st = jnp.pad(st, ((0, 0), (0, 0), (0, n_pad - N)),
                 constant_values=_PAD_COORD)

    grid = (B, m_pad // _TQ)
    idx = pl.pallas_call(
        functools.partial(_ball_kernel, k_eff, nsample, r2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TQ, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TQ, k_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, k_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_TQ, n_pad), jnp.int32)],
        interpret=interpret,
    )(q, st)
    return idx[:, :M, :nsample]
