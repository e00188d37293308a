"""Fused per-part confidence branch (Pallas TPU).

The confidence head's grouped projection (reference
`src/models/pointtransformer_seg.py:145`: Conv1d(c0, c0*k) -> ReLU ->
grouped Conv1d(c0*k, k, groups=k)) materializes z = relu(h @ W0) of shape
(B, N, k*c0) — 880 MB bf16 at B=8, N=5000, c0=128, k=86 — writes it, layout-
copies it, and reads it back for the per-part reduction (~8 ms/forward,
trace r5).  Fused, z only ever exists as a (T, kc*c0) VMEM tile:

  per_part[r, kk] = sum_c relu((h @ W0)[r, kk*c0+c]) * Wg[kk, c] + bg[kk]

grid = (row tiles, k chunks); two MXU dots per tile (depth c0, then depth
kc*c0 against a block-diagonal expansion of Wg).  Inference-only; training
and non-TPU take the XLA composite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF = jax.lax.Precision.DEFAULT


def grouped_head_ref(h, w0, b0, wg, bg):
    """h (R, c0); w0 (c0, k*c0); b0 (k*c0,); wg (k, c0); bg (k,) ->
    per_part (R, k)."""
    R, c0 = h.shape
    k = wg.shape[0]
    z = jax.nn.relu(h @ w0 + b0).reshape(R, k, c0)
    return jnp.einsum("rkc,kc->rk", z, wg) + bg


def _kernel(T, c0, kp, ch, h_ref, w0_ref, b0_ref, wgbd_ref, o_ref):
    # loop k-chunks of the z lanes; the (T, kp*c0) intermediate never exists
    # whole.  Lane slices of W0/b0 are ch-aligned (ch % 128 == 0); the
    # wgbd row slice keeps the full kp lane width (its off-chunk columns
    # are structurally zero, so the accumulation is exact).
    acc = None
    for j in range(kp * c0 // ch):
        zj = jax.lax.dot_general(
            h_ref[:], w0_ref[:, pl.ds(j * ch, ch)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        ) + b0_ref[0, pl.ds(j * ch, ch)]         # (T, ch) f32
        zj = jax.nn.relu(zj)
        pj = jax.lax.dot_general(
            zj.astype(wgbd_ref.dtype), wgbd_ref[pl.ds(j * ch, ch), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )                                        # (T, kp)
        acc = pj if acc is None else acc + pj
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_head_pallas(h, w0, b0, wg, bg, interpret: bool = False):
    R, c0 = h.shape
    k = wg.shape[0]
    # pad k so the z lane chunks divide evenly
    ch = 2048
    assert ch % c0 == 0 and ch % 128 == 0
    kc = ch // c0
    kpad = (-k) % kc
    kp = k + kpad
    if kpad:
        w0 = jnp.pad(w0, ((0, 0), (0, kpad * c0)))
        b0 = jnp.pad(b0, (0, kpad * c0))
        wg = jnp.pad(wg, ((0, kpad), (0, 0)))
    T = 256
    rpad = (-R) % T
    if rpad:
        h = jnp.pad(h, ((0, rpad), (0, 0)))
    Rp = R + rpad

    # block-diagonal Wg: (kp*c0, kp) with Wg[kk] in block (kk*c0:(kk+1)*c0, kk)
    wgbd = (wg[:, :, None] * jnp.eye(kp, dtype=wg.dtype)[:, None, :]
            ).reshape(kp * c0, kp)

    cdt = jnp.bfloat16
    inv = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, T, c0, kp, ch),
        grid=(Rp // T,),
        in_specs=[
            pl.BlockSpec((T, c0), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            inv((c0, kp * c0)), inv((1, kp * c0)), inv((kp * c0, kp)),
        ],
        out_specs=pl.BlockSpec((T, kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, kp), jnp.float32),
        interpret=interpret,
    )(h.astype(cdt), w0.astype(cdt), b0[None].astype(jnp.float32),
      wgbd.astype(cdt))
    return out[:R, :k] + bg


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_grouped_head(h, w0, b0, wg, bg, use_pallas):
    if use_pallas:
        return grouped_head_pallas(h, w0, b0, wg, bg)
    return grouped_head_ref(h, w0, b0, wg, bg)


def _fgh_fwd(h, w0, b0, wg, bg, use_pallas):
    return fused_grouped_head(h, w0, b0, wg, bg, use_pallas), (h, w0, b0,
                                                               wg, bg)


def _fgh_bwd(use_pallas, res, g):
    _, vjp = jax.vjp(grouped_head_ref, *res)
    return vjp(g.astype(jnp.float32))


fused_grouped_head.defvjp(_fgh_fwd, _fgh_bwd)
