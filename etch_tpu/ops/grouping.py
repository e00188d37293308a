"""Batched gather / grouping ops.

On GPU the reference needs custom gather/scatter-add kernels
(`external/pointops/src/grouping/grouping_cuda_kernel.cu:5-27`,
`external/vgtk/vgtk/cuda/gathering_cuda_kernel.cu:43-103`); on TPU XLA's
native gather/scatter lowering (and its transpose for the backward pass) is
already optimal, so these are thin jnp compositions kept as named ops for
parity and testability.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0]


@jax.custom_vjp
def materialize_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Force (B, N, D) into the default row-major (8,128)-tiled layout.

    XLA's layout assignment sometimes gives intermediate tensors a
    batch-interleaved layout like {2,0,1:T(4,128)} (minor-to-major D, B, N —
    chosen to suit an adjacent dot), which makes every row slice of a
    subsequent row-gather strided across tiles: profiled 3.6-7 ms per
    inter-conv gather vs ~1 ms from a naturally-laid-out source.  Pallas
    operands and results are required to use default layouts, so an identity
    pallas_call is a layout pin: one fast contiguous copy, and the gather
    then reads {2,1,0:T(8,128)} rows.  No-op on non-TPU backends.
    """
    if jax.default_backend() != "tpu" or x.ndim != 3:
        return x
    B, N, D = x.shape
    if D % 128:
        return x
    # split the lane dim so blocks fit VMEM; pallas double-buffers each of
    # in/out, so the live footprint is ~4 blocks.  N can be arbitrary (a
    # block dim equal to the full array dim needs no alignment).
    budget = 12 * 1024 * 1024
    dt = next(
        (d for d in range(D, 0, -128)
         if D % d == 0 and d % 128 == 0
         and 4 * N * d * x.dtype.itemsize <= budget),
        128,
    )
    return pl.pallas_call(
        _copy_kernel,
        grid=(B, D // dt),
        in_specs=[pl.BlockSpec((1, N, dt), lambda b, d: (b, 0, d),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, dt), lambda b, d: (b, 0, d),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
    )(x)


def _materialize_rows_fwd(x):
    return materialize_rows(x), None


def _materialize_rows_bwd(_, g):
    # identity function: pass the cotangent straight through (pallas_call
    # itself has no autodiff rule, hence the custom_vjp)
    return (g,)


materialize_rows.defvjp(_materialize_rows_fwd, _materialize_rows_bwd)


@functools.lru_cache(maxsize=None)
def _make_flat_gather(shape: tuple, dtype_name: str, on_tpu: bool):
    """Build a custom_vjp flat row-gather closed over static shape/dtype.

    shape/dtype must NOT travel through the custom_vjp residuals (residuals
    are a pytree of JAX values; an np.dtype there raises TypeError under
    jax.grad), so this factory bakes them in statically, keyed by
    (shape, dtype, backend).
    """
    dtype = jnp.dtype(dtype_name)
    T = shape[0]

    @jax.custom_vjp
    def flat_gather(flat, gidx):
        return flat[gidx]

    def fwd(flat, gidx):
        return flat[gidx], gidx

    def bwd(gidx, g):
        use_onehot = (on_tpu
                      and os.environ.get("ETCH_GATHER_BWD", "scatter")
                      == "onehot")
        if not use_onehot:
            # Scatter-add transpose — the default everywhere since round 5.
            # History: round 1 measured the TPU scatter emitter at ~100 GB/s
            # (15.9 ms at 131k rows x 1920 lanes) and the one-hot matmul
            # below pattern-matched to an optimized 2.4 ms path.  The
            # compiler shipped with the restarted axon terminal (2026-08-20)
            # INVERTED this: one-hot 110.2 ms vs scatter 27.6 ms at
            # (262144 -> 20000, 1920) — the gather backwards were ~940 ms
            # of the 3.8 s train step (trace r5 train).  ETCH_GATHER_BWD=
            # onehot restores the old path for future compiler A/Bs.
            zero = jnp.zeros(shape, g.dtype)
            dflat = zero.at[gidx].add(g)
            return dflat.astype(dtype), None
        g2 = g.reshape(g.shape[0], -1)
        oh = jax.nn.one_hot(gidx, T, dtype=g2.dtype)
        dflat = jax.lax.dot_general(
            oh, g2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        return dflat.reshape(shape), None

    flat_gather.defvjp(fwd, bwd)
    return flat_gather


def _flat_gather(flat: jnp.ndarray, gidx: jnp.ndarray) -> jnp.ndarray:
    """flat: (T, ...), gidx: (R,) int32 -> (R, ...)."""
    fn = _make_flat_gather(tuple(flat.shape), jnp.dtype(flat.dtype).name,
                           jax.default_backend() == "tpu")
    return fn(flat, gidx)


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, ...), idx: (B, M) -> (B, M, ...).

    Implemented as ONE flat row gather with globalized indices rather than a
    vmap of per-batch gathers: TPU's emitter for a batched gather copies the
    operand into a batch-interleaved {2,0,1:T(4,128)} layout first (each row
    fetch then drags the other batches' rows through the tile — profiled
    3.6-7 ms per inter-conv gather).  A 2D (B*N, ...) operand leaves only
    the natural row-major layout, and the same gather runs ~5-9x faster.
    (take_along_axis is worse still: its trailing broadcast dims lower to an
    element-wise gather with slice size 1.)  The backward pass is a one-hot
    matmul (see _flat_gather_bwd).
    """
    B, N = feats.shape[:2]
    M = idx.shape[1]
    flat = feats.reshape((B * N,) + feats.shape[2:])
    gidx = (idx + (jnp.arange(B, dtype=idx.dtype) * N)[:, None]).reshape(B * M)
    return _flat_gather(flat, gidx).reshape((B, M) + feats.shape[2:])


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats: (B, N, C...), idx: (B, M, K) -> (B, M, K, C...)."""
    B, M, K = idx.shape
    flat = gather_points(feats, idx.reshape(B, M * K))
    return flat.reshape((B, M, K) + feats.shape[2:])


def group_points_transposed(feats: jnp.ndarray, idx: jnp.ndarray):
    """feats: (B, N, C), idx: (B, M, K) -> (K, B*M, C) neighbor-major.

    Same flat 2D-operand row gather as group_points, but indexed with the
    transposed index array so the output is born neighbor-major — the layout
    the fused vector-attention kernel wants — at zero extra cost (a gather
    does not care about row order).  Inference-only (no custom one-hot VJP;
    the training path uses the point-major group_points)."""
    B, N = feats.shape[:2]
    _, M, K = idx.shape
    flat = feats.reshape((B * N,) + feats.shape[2:])
    gidx = (idx + (jnp.arange(B, dtype=idx.dtype) * N)[:, None, None])
    return flat[gidx.reshape(B * M, K).T]
