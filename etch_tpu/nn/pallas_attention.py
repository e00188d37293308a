"""Fused per-point multi-head self-attention over anchor tokens (Pallas TPU).

The direction head runs MHSA over L=60 anchor tokens *per point* (reference
`src/models/direction_backbones.py:129-223`): a batched-tiny attention where
XLA must materialize the (points, H, L, L) logits/probabilities in HBM.
Profiled at B=8, N=5000 the XLA packed-block-diagonal path spends ~95 ms per
forward in the attention fusions alone — mostly HBM traffic on bf16 tiles
whose minor dims (8, 60) pad to (16, 128), moving ~4x the nominal bytes.

This kernel keeps every intermediate in VMEM and is *phase-structured* so the
MXU dot streams are never interleaved with per-point VPU work (the round-1
kernel looped VPU mask-builds between dots and lost to the XLA path):

  phase 0 (tile-wide, VPU):
      K2[t, h*L+k, e] = k[t, k, e] * mask[e in head h]   (pltpu.repeat + mask)
      V2 likewise.
  phase 1 (per-point MXU, back-to-back):
      z[t*L+q, h*L+k] = sum_e q[t, q, e] K2[t, h*L+k, e]
  phase 2 (tile-wide softmax over k within each h block):
      PER-BLOCK max via H static lane slices (a global row max underflows
      whole blocks when heads' logit ranges are hundreds of nats apart —
      denominator 0 -> NaN on trained weights), broadcast back to h*L
      lanes with a one-hot matmul; per-(q, h) denominators and their
      broadcast likewise.
  phase 3 (per-point MXU, back-to-back):
      out[t, q, e] = sum attn[t*L+q, h*L+k] V2[t, h*L+k, e]

Backward falls back to the XLA reference implementation via custom_vjp
(the head is wrapped in nn.remat during training anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def packed_attention(q, k, v, num_heads: int):
    """Packed block-diagonal attention (XLA path): all H heads ride one
    E-deep logits dot and one HL-deep AV dot via a static 0/1 head mask —
    MXU-shaped where the per-head hs=8 contraction is not.  Numerically
    equal to attention_ref up to fp association; differentiable by plain
    autodiff.  q pre-scaled by 1/sqrt(head_size)."""
    Bc, L, E = q.shape
    H = num_heads
    hs = E // H
    mask = np.zeros((E, H), np.float32)
    for h in range(H):
        mask[h * hs:(h + 1) * hs, h] = 1.0
    cdt = q.dtype
    maskc = jnp.asarray(mask, cdt)
    k2 = jnp.einsum("bke,eh->bhke", k, maskc)
    logits = jax.lax.dot_general(
        q, k2,
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # (B, q, H, k)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
    v2 = jnp.einsum("bke,eh->bhke", v, maskc)
    return jax.lax.dot_general(
        attn, v2,
        dimension_numbers=(((2, 3), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)                                       # (B, q, E)


def attention_ref(q, k, v, num_heads: int):
    """Plain per-head attention, (Bc, L, E) -> (Bc, L, E).  VJP body and
    numerical reference (q is expected pre-scaled by 1/sqrt(head_size))."""
    Bc, L, E = q.shape
    H = num_heads
    hs = E // H

    def split(t):
        return t.reshape(Bc, L, H, hs).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(Bc, L, E)


def _kernel(T, L, E, H, q_ref, k_ref, v_ref, mr_ref, go_ref, gt_ref,
            mrow_ref, o_ref, k2_s, v2_s, z_s, a_s):
    HL = H * L
    # phase 0: head-expanded K/V for the whole tile (one VPU pass each)
    mask = mr_ref[:, :]                                   # (HL, E) bf16
    k2_s[:] = pltpu.repeat(k_ref[:], H, axis=1) * mask[None]
    v2_s[:] = pltpu.repeat(v_ref[:], H, axis=1) * mask[None]

    # phase 1: logits dots, back-to-back (MXU pipelined)
    for t in range(T):
        z_s[pl.ds(t * L, L), :] = jax.lax.dot_general(
            q_ref[t], k2_s[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                 # (L, HL)

    # phase 2: tile-wide softmax over each h block of L lanes.
    # The shift must be the PER-BLOCK max, not the global row max: with
    # trained weights one head's logits can sit hundreds of nats below
    # another head's, and a globally-shifted exp underflows the whole
    # block to 0 -> denominator 0 -> 0 * inf = NaN (hit on the real-scan
    # checkpoint; random-weight benches never trip it).  Block maxes via
    # H static lane slices, broadcast back with the one-hot matmul —
    # denominators are >= 1 by construction.
    z = z_s[:]                                            # (T*L, HL) f32
    # block max h = full-width max of z + mrow[h] (0 on block h, -1e30
    # elsewhere): aligned tile-wide VPU ops only — the unaligned 60-lane
    # slice variant measured 4x slower.  The per-lane broadcast of the
    # block maxes is a max-combine over the same mask rows (off-block
    # lanes sit at ~-1e30 and never win), avoiding a lane concat and a
    # broadcast matmul.
    mbb = None
    for h in range(H):
        row = mrow_ref[h:h + 1, :]                        # (1, HL)
        mh = jnp.max(z + row, axis=1, keepdims=True) + row
        mbb = mh if mbb is None else jnp.maximum(mbb, mh)
    ez = jnp.exp(z - mbb)
    denom = jax.lax.dot_general(
        ez, go_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (T*L, H)
    db = jax.lax.dot_general(
        1.0 / denom, gt_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (T*L, HL)
    a_s[:] = (ez * db).astype(a_s.dtype)

    # phase 3: attention-value dots, back-to-back
    for t in range(T):
        o_ref[t] = jax.lax.dot_general(
            a_s[pl.ds(t * L, L), :], v2_s[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "tile", "interpret"))
def attention_pallas(q, k, v, num_heads: int, tile: int = 16,
                     interpret: bool = False):
    """(Bc, L, E) bf16/f32 -> (Bc, L, E) f32.  q pre-scaled."""
    Bc, L, E = q.shape
    H = num_heads
    T = min(tile, Bc)
    pad = (-Bc) % T
    if pad:
        zz = ((0, pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, zz), jnp.pad(k, zz), jnp.pad(v, zz)
    Bp = Bc + pad

    hs = E // H
    mask_rows = np.zeros((H * L, E), np.float32)
    for h in range(H):
        mask_rows[h * L:(h + 1) * L, h * hs:(h + 1) * hs] = 1.0
    g_ones = np.zeros((H * L, H), np.float32)
    for h in range(H):
        g_ones[h * L:(h + 1) * L, h] = 1.0
    mrow = np.full((H, H * L), -1e30, np.float32)
    for h in range(H):
        mrow[h, h * L:(h + 1) * L] = 0.0

    qkv_spec = pl.BlockSpec((T, L, E), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    cdt = jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(_kernel, T, L, E, H),
        grid=(Bp // T,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((H * L, E), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H * L, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, H * L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((H, H * L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, L, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, H * L, E), cdt),        # K2
            pltpu.VMEM((T, H * L, E), cdt),        # V2
            pltpu.VMEM((T * L, H * L), jnp.float32),  # logits
            pltpu.VMEM((T * L, H * L), cdt),       # attn
        ],
        interpret=interpret,
    )(q.astype(cdt), k.astype(cdt), v.astype(cdt),
      jnp.asarray(mask_rows, cdt), jnp.asarray(g_ones),
      jnp.asarray(g_ones.T.copy()), jnp.asarray(mrow))
    return out[:Bc]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, num_heads, use_pallas):
    """Differentiable fused anchor attention; q pre-scaled by 1/sqrt(hs)."""
    if use_pallas:
        return attention_pallas(q, k, v, num_heads)
    return attention_ref(q, k, v, num_heads)


def _fa_fwd(q, k, v, num_heads, use_pallas):
    return fused_attention(q, k, v, num_heads, use_pallas), (q, k, v)


def _fa_bwd(num_heads, use_pallas, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: attention_ref(a, b, c, num_heads),
                     q, k, v)
    return vjp(g.astype(jnp.float32))


fused_attention.defvjp(_fa_fwd, _fa_bwd)
