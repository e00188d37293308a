"""Fused Point-Transformer vector attention (Pallas TPU), post-gather.

The U-Net heads' vector-attention layer (reference
`src/models/pointtransformer_seg.py:8-37`) chains, per neighborhood tensor
(B, N, ns, c):  w = key − query + posenc → BN → ReLU → Dense(c→c/s) → BN →
ReLU → Dense(c/s→c/s) → softmax over ns → s-fold broadcast → weighted sum.
Under XLA every arrow is an HBM round trip, and the (…, ns, c/s) tensors
have an 8-lane minor dim padded to 128 — each elementwise pass moves ~16×
the nominal bytes.  At B=8, N=5000 the two U-Net heads spend ~100 ms/forward
in these fusions (trace r5).

The kernel is *neighbor-major*: gathered operands arrive as (ns, R, c) —
the gather produces this layout for free from transposed indices — so every
segment op over the ns neighbors is a static (T, ·) block slice (Mosaic
rejects the interleaved point-major view: "unsupported shape cast").
Per (T points) tile:

  VPU:   w_j = key_j − q + pe_j, BN affines, softmax over the ns row blocks
         (elementwise max/sum over static slices).
  MXU:   the two w-MLP matmuls on the stacked (ns·T, c) scratch, and the
         s-fold lane tile of the attention weights (pltpu.repeat).

Inference-only: BatchNorm is an affine at eval time; the caller folds
running stats into (scale, bias) rows.  Training takes the XLA reference
path (the heads are remat'd there anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF = jax.lax.Precision.DEFAULT


def vector_attention_ref(xq, gk, gv, pe, a0, w0, a1, w1, b1):
    """Reference/backward path, point-major shapes: xq (R, c); gk/gv/pe
    (R, ns, c); a0 (2, c) = eval-BN scale/bias rows; w0 (c, cs); a1 (2, cs)
    with the Dense-0 bias pre-folded; w1 (cs, cs); b1 (1, cs).
    Returns (R, c) f32."""
    R, ns, c = gk.shape
    cs = w0.shape[1]
    s = c // cs
    w = (gk - xq[:, None, :] + pe).astype(jnp.float32)
    w = jax.nn.relu(w * a0[0] + a0[1])
    w = w.astype(w0.dtype) @ w0
    w = jax.nn.relu(w.astype(jnp.float32) * a1[0] + a1[1])
    w = (w.astype(w1.dtype) @ w1).astype(jnp.float32) + b1[0]
    w = jax.nn.softmax(w, axis=1)                           # over ns
    v = (gv + pe).astype(jnp.float32).reshape(R, ns, s, cs)
    out = jnp.sum(v * w[:, :, None, :], axis=1)             # (R, s, cs)
    return out.reshape(R, c)


def _kernel(T, ns, c, cs, xq_ref, gk_ref, gv_ref, pe_ref, a0_ref, w0_ref,
            a1_ref, w1_ref, b1_ref, o_ref, w_s, z_s):
    s = c // cs
    # phase 0 (VPU): build w_j rows into the (ns*T, c) scratch
    q = xq_ref[:].astype(jnp.float32)
    a0s, a0b = a0_ref[0].astype(jnp.float32), a0_ref[1].astype(jnp.float32)
    for j in range(ns):
        wj = (gk_ref[j].astype(jnp.float32) - q
              + pe_ref[j].astype(jnp.float32))
        w_s[pl.ds(j * T, T), :] = jax.nn.relu(wj * a0s + a0b).astype(
            w_s.dtype)
    # phase 1 (MXU): the two w-MLP matmuls on the stacked rows
    z = jax.lax.dot_general(
        w_s[:], w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_DEF,
    )                                                       # (ns*T, cs) f32
    z = jax.nn.relu(z * a1_ref[0].astype(jnp.float32)
                    + a1_ref[1].astype(jnp.float32))
    z_s[:] = jax.lax.dot_general(
        z.astype(z_s.dtype), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_DEF,
    ).astype(z_s.dtype)
    # phase 2 (VPU): softmax over the ns row blocks + weighted sum.
    # b1 (the Dense-1 bias) is identical across the ns rows of each softmax
    # group and cancels exactly — see the caller note.
    m = None
    for j in range(ns):
        zj = z_s[pl.ds(j * T, T), :].astype(jnp.float32)
        m = zj if m is None else jnp.maximum(m, zj)
    den = None
    for j in range(ns):
        zj = z_s[pl.ds(j * T, T), :].astype(jnp.float32)
        ej = jnp.exp(zj - m)
        den = ej if den is None else den + ej
    inv_den = 1.0 / den
    acc = None
    for j in range(ns):
        zj = z_s[pl.ds(j * T, T), :].astype(jnp.float32)
        attn_j = jnp.exp(zj - m) * inv_den                  # (T, cs)
        af = pltpu.repeat(attn_j, s, axis=1)                # (T, c)
        vj = (gv_ref[j].astype(jnp.float32)
              + pe_ref[j].astype(jnp.float32)) * af
        acc = vj if acc is None else acc + vj
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def vector_attention_pallas(xq, gk, gv, pe, a0, w0, a1, w1, b1,
                            interpret: bool = False):
    """Neighbor-major operands: xq (R, c); gk/gv/pe (ns, R, c).
    Returns (R, c) f32.  b1 (1, cs) is added into a1's bias row here."""
    R, c = xq.shape
    ns = gk.shape[0]
    cs = w0.shape[1]
    # b1 (the post-Dense-1 bias) adds the same per-lane constant to every
    # one of the ns logits in a softmax group, so it cancels exactly in the
    # softmax — the kernel accepts it for interface parity and ignores it
    # (it is a dead parameter in the reference model too).
    # tile size: ns*T*c*2B per gathered operand <= ~1 MB
    tn_cap = max(256, min(2048, (1 << 20) // (2 * c) // ns * ns))
    T = max(8, tn_cap // ns)
    pad = (-R) % T
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        zz = ((0, 0), (0, pad), (0, 0))
        gk, gv, pe = jnp.pad(gk, zz), jnp.pad(gv, zz), jnp.pad(pe, zz)
    Rp = R + pad

    cdt = jnp.bfloat16
    inv = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    nsblock = pl.BlockSpec((ns, T, c), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, T, ns, c, cs),
        grid=(Rp // T,),
        in_specs=[
            pl.BlockSpec((T, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            nsblock, nsblock, nsblock,
            inv((2, c)), inv((c, cs)), inv((2, cs)), inv((cs, cs)),
            inv((1, cs)),
        ],
        out_specs=pl.BlockSpec((T, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ns * T, c), cdt),       # stacked w rows
            pltpu.VMEM((ns * T, cs), jnp.float32),  # z (post-MLP logits)
        ],
        interpret=interpret,
    )(xq.astype(cdt), gk.astype(cdt), gv.astype(cdt), pe.astype(cdt),
      a0.astype(jnp.float32), w0.astype(cdt), a1.astype(jnp.float32),
      w1.astype(cdt), b1.astype(jnp.float32))
    return out[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_vector_attention(xq, gk, gv, pe, a0, w0, a1, w1, b1, use_pallas):
    """Differentiable wrapper.  Point-major (R, ns, c) operands for the
    reference path; the Pallas path transposes to neighbor-major (the
    caller can instead pass pre-transposed operands to
    vector_attention_pallas directly to make the transpose free)."""
    if use_pallas:
        return vector_attention_pallas(
            xq, gk.transpose(1, 0, 2), gv.transpose(1, 0, 2),
            pe.transpose(1, 0, 2), a0, w0, a1, w1, b1)
    return vector_attention_ref(xq, gk, gv, pe, a0, w0, a1, w1, b1)


def _fva_fwd(xq, gk, gv, pe, a0, w0, a1, w1, b1, use_pallas):
    out = fused_vector_attention(xq, gk, gv, pe, a0, w0, a1, w1, b1,
                                 use_pallas)
    return out, (xq, gk, gv, pe, a0, w0, a1, w1, b1)


def _fva_bwd(use_pallas, res, g):
    _, vjp = jax.vjp(vector_attention_ref, *res)
    return vjp(g.astype(jnp.float32))


fused_vector_attention.defvjp(_fva_fwd, _fva_bwd)
