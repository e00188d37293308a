"""Furthest point sampling as a Pallas TPU kernel.

FPS is inherently sequential over the m selected centers (SURVEY §7 "hard
parts"); the XLA fori_loop version keeps its loop carry in HBM between
iterations.  This kernel pins the whole working set in VMEM — coordinates,
the running min-distance rows and the selected-index accumulator — and packs
up to 8 clouds into the 8 VPU sublanes, so one sequential loop advances the
whole batch: each of the m steps is a handful of vectorized row ops over
resident data with no HBM traffic.

Semantics identical to etch_tpu.ops.fps._fps_xla (and the reference CUDA
kernels, external/pointops/src/sampling/sampling_cuda_kernel.cu:5-171,
external/vgtk/vgtk/cuda/grouping_cuda_kernel.cu:340-430): start from point 0,
greedily take the argmax of the running min-distance.

Layout: coordinates arrive as three (8, Np) sublane-packed planes (batch in
sublanes, points in lanes, Np a multiple of 128).  Padding lanes get
min-distance -inf so they are never selected; padding sublanes are harmless.
Scalar dynamic indexing on the lane axis is avoided: the "last selected
point" of every cloud is extracted with a masked row reduction and indices
are committed with a masked select — all full-tile VPU ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # sublanes per tile == clouds per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(m: int, n: int, x_ref, y_ref, z_ref, out_ref, mind_ref, sel_ref):
    np_lanes = x_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, np_lanes), 1)
    valid = lane < n

    mind_ref[:] = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)
    sel_ref[:] = jnp.zeros_like(sel_ref)

    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]

    def body(i, last):  # last: (8, 1) int32, per-cloud previous selection
        sel_mask = lane == last
        cx = jnp.sum(jnp.where(sel_mask, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel_mask, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel_mask, z, 0.0), axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        mind = jnp.minimum(mind_ref[:], jnp.where(valid, d, -jnp.inf))
        mind_ref[:] = mind
        nxt = jnp.argmax(mind, axis=1, keepdims=True).astype(jnp.int32)
        m_lane = jax.lax.broadcasted_iota(jnp.int32, sel_ref.shape, 1)
        sel_ref[:] = jnp.where(m_lane == i, nxt, sel_ref[:])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.zeros((_SUB, 1), jnp.int32))
    out_ref[:] = sel_ref[:]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def fps_pallas(xyz: jnp.ndarray, m: int, interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, m) int32 indices."""
    B, N, _ = xyz.shape
    n_pad = _round_up(N, 128)
    m_pad = _round_up(m, 128)
    b_pad = _round_up(B, _SUB)
    groups = b_pad // _SUB

    xt = jnp.swapaxes(xyz, 1, 2).astype(jnp.float32)          # (B, 3, N)
    xt = jnp.pad(xt, ((0, b_pad - B), (0, 0), (0, n_pad - N)))
    # (groups, 8, n_pad) sublane-packed planes per coordinate
    planes = [
        xt[:, c, :].reshape(groups, _SUB, n_pad) for c in range(3)
    ]

    kernel = functools.partial(_fps_kernel, m, N)
    spec = pl.BlockSpec((1, _SUB, n_pad), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(groups,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((_SUB, m_pad), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_SUB, n_pad), jnp.float32),
            pltpu.VMEM((_SUB, m_pad), jnp.int32),
        ],
        interpret=interpret,
    )(*planes)
    return out[:B, :m]
