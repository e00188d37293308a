"""Fused per-point multi-head self-attention over anchor tokens (Pallas TPU).

The direction head runs MHSA over L=60 anchor tokens *per point* (reference
`src/models/direction_backbones.py:129-223`): a batched-tiny attention where
XLA must materialize the (points, H, L, L) logits/probabilities in HBM —
profiled at ~3.7 ms per (2048-point, 60, 64) chunk-layer even with the
packed block-diagonal formulation, almost entirely HBM softmax traffic.

This kernel keeps everything per point in VMEM.  All matmuls are 2D and
transpose-free via a head-expanded row layout:

  K2[h*L+k, e] = k[k, e] * mask[e, h]      (pltpu.repeat + static 0/1 mask)
  z[q, h*L+k]  = sum_e q[q,e] K2[h*L+k, e]  (dot, contract dim 1 of both)
  softmax over k within each h block:
      row max over ALL 480 lanes (a valid shift for every block; exp in f32
      so a too-large shift cannot underflow bf16), per-(q,h) denominators
      and their broadcast back to h*L lanes via block-ones matmuls.
  out[q, e]    = sum attn[q, h*L+k] V2[h*L+k, e],  V2 built like K2.

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


def _kernel(T, L, E, H, q_ref, k_ref, v_ref, mr_ref, go_ref, gt_ref, o_ref):
    for t in range(T):
        kt = pltpu.repeat(k_ref[t], H, axis=0)           # (H*L, E)
        K2 = (kt * mr_ref[:, :]).astype(jnp.bfloat16)
        z = jax.lax.dot_general(
            q_ref[t].astype(jnp.bfloat16), K2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                # (L, H*L)
        m = jnp.max(z, axis=1, keepdims=True)
        ez = jnp.exp(z - m)                              # f32
        denom = jax.lax.dot_general(
            ez, go_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (L, H)
        db = jax.lax.dot_general(
            1.0 / denom, gt_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (L, H*L)
        attn = (ez * db).astype(jnp.bfloat16)
        vt = pltpu.repeat(v_ref[t], H, axis=0)
        V2 = (vt * mr_ref[:, :]).astype(jnp.bfloat16)
        o_ref[t] = jax.lax.dot_general(
            attn, V2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "tile", "interpret"))
def attention_pallas(q, k, v, num_heads: int, tile: int = 32,
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
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, L, E), jnp.float32),
        interpret=interpret,
    )(q.astype(cdt), k.astype(cdt), v.astype(cdt),
      jnp.asarray(mask_rows), jnp.asarray(g_ones),
      jnp.asarray(g_ones.T.copy()))
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
