"""Fully-fused direction-head core (Pallas TPU).

The direction head runs, per point: 2-layer MHSA over the 60 anchor tokens
(reference `src/models/direction_backbones.py:197-223`), a BatchMLP
(:37-76) and the scalar so3_reg projection (models_pointcloud.py:54).
Round-4 fused only the attention inner product (`pallas_attention.py`);
the QKV/combine/MLP matmuls, the residual, and the nn.scan chunk machinery
around it still cost ~23 ms of HBM round trips + layout copies per forward
at B=8 (trace r5: while.111 = 82.9 ms of which attention 60.1).

This kernel runs the ENTIRE core per (T points) tile in VMEM:

  MXU:   QKV projections / head_combine / MLP as (T·A, ·)-row batched dots;
         the per-point logit and attention-value dots back-to-back
         (phase-structured, exactly the pallas_attention recipe — including
         the per-head-block softmax max that fixes the trained-weights NaN).
  VPU:   head expansion (pltpu.repeat + mask), softmax, residual add.

Token stack is read from HBM exactly once; the only output is the (R·A, 1)
anchor-weight column.  Inference-only (bf16 compute); training keeps the
chunked XLA path (remat'd scan) on the same explicit parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from etch_tpu.nn.pallas_attention import attention_ref

_DEF = jax.lax.Precision.DEFAULT


def direction_core_ref(tokens, params, num_heads: int, attn=None):
    """Pure-function reference (and training/backward path).

    tokens: (Bc, A, E); params: dict of explicit weights; returns (Bc, A)
    f32 anchor weights.  Matches the round-4 module semantics:
    StackedMHSA(2 layers, residual on all but last) -> BatchMLP -> Dense(1).
    `attn(q, k, v, H)` defaults to the plain per-head reference; callers
    pass packed_attention (MXU-shaped XLA) or the fused per-chunk kernel.
    """
    if attn is None:
        attn = attention_ref
    h = tokens
    E = h.shape[-1]
    hs = E // num_heads
    scale = 1.0 / float(np.sqrt(hs))
    n_layers = len([k for k in params if k.startswith("wq")])
    for l in range(n_layers):
        q = ((h @ params[f"wq{l}"]) * scale).astype(h.dtype)
        k = (h @ params[f"wk{l}"]).astype(h.dtype)
        v = (h @ params[f"wv{l}"]).astype(h.dtype)
        att = attn(q, k, v, num_heads).astype(h.dtype)
        y = att @ params[f"wc{l}"] + params[f"bc{l}"]
        h = (y if l == n_layers - 1 else h + y).astype(h.dtype)
    h = jax.nn.relu(h @ params["wm0"] + params["bm0"]).astype(h.dtype)
    h = h @ params["wm1"] + params["bm1"]
    h = h.astype(jnp.float32)
    return (h @ params["wr"].astype(jnp.float32))[..., 0] + params["br"]


def _attention_phases(T, A, E, H, q2, k2, v2, k2_s, v2_s, z_s, a_s,
                      mr, go, gt, mrow, out_rows):
    """pallas_attention phases 0-3 on 2D (T*A, E) projections; writes the
    per-point attention outputs into out_rows (T*A, E) f32."""
    HL = H * A
    for t in range(T):
        kt = k2[t * A:(t + 1) * A, :]
        vt = v2[t * A:(t + 1) * A, :]
        k2_s[t] = pltpu.repeat(kt, H, axis=0) * mr
        v2_s[t] = pltpu.repeat(vt, H, axis=0) * mr
    for t in range(T):
        z_s[pl.ds(t * A, A), :] = jax.lax.dot_general(
            q2[t * A:(t + 1) * A, :], k2_s[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )
    z = z_s[:]
    mbb = None
    for h in range(H):
        row = mrow[h:h + 1, :]
        mh = jnp.max(z + row, axis=1, keepdims=True) + row
        mbb = mh if mbb is None else jnp.maximum(mbb, mh)
    ez = jnp.exp(z - mbb)
    denom = jax.lax.dot_general(
        ez, go, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db = jax.lax.dot_general(
        1.0 / denom, gt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a_s[:] = (ez * db).astype(a_s.dtype)
    for t in range(T):
        out_rows[pl.ds(t * A, A), :] = jax.lax.dot_general(
            a_s[pl.ds(t * A, A), :], v2_s[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF,
        )


def _kernel(T, A, E, H, V, x_ref,
            wq0_ref, wk0_ref, wv0_ref, wc0_ref, bc0_ref,
            wq1_ref, wk1_ref, wv1_ref, wc1_ref, bc1_ref,
            wm0_ref, bm0_ref, wm1_ref, bm1_ref, wr_ref,
            mr_ref, go_ref, gt_ref, mrow_ref,
            o_ref, k2_s, v2_s, z_s, a_s, att_s):
    hs = E // H
    scale = 1.0 / float(np.sqrt(hs))
    cdt = x_ref.dtype

    def dot2(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF)

    mr, go = mr_ref[:, :], go_ref[:, :]
    gt, mrow = gt_ref[:, :], mrow_ref[:, :]

    # ---- layer 0 ----
    x = x_ref[:]
    q2 = (dot2(x, wq0_ref[:]) * scale).astype(cdt)
    k2 = dot2(x, wk0_ref[:]).astype(cdt)
    v2 = dot2(x, wv0_ref[:]).astype(cdt)
    _attention_phases(T, A, E, H, q2, k2, v2, k2_s, v2_s, z_s, a_s,
                      mr, go, gt, mrow, att_s)
    y = dot2(att_s[:].astype(cdt), wc0_ref[:]) + bc0_ref[0]
    h = (x.astype(jnp.float32) + y).astype(cdt)             # residual

    # ---- layer 1 (no residual; combine widens E -> V) ----
    q2 = (dot2(h, wq1_ref[:]) * scale).astype(cdt)
    k2 = dot2(h, wk1_ref[:]).astype(cdt)
    v2 = dot2(h, wv1_ref[:]).astype(cdt)
    _attention_phases(T, A, E, H, q2, k2, v2, k2_s, v2_s, z_s, a_s,
                      mr, go, gt, mrow, att_s)
    h = (dot2(att_s[:].astype(cdt), wc1_ref[:]) + bc1_ref[0]).astype(cdt)

    # ---- BatchMLP + so3_reg ----
    h = jax.nn.relu(dot2(h, wm0_ref[:]) + bm0_ref[0]).astype(cdt)
    h = dot2(h, wm1_ref[:]) + bm1_ref[0]                    # (T*A, V) f32
    # scalar projection as mult + lane reduce (a 1-lane matmul is not a
    # useful MXU shape); bias br is added by the caller
    o_ref[:] = jnp.sum(h * wr_ref[0].astype(jnp.float32), axis=1,
                       keepdims=True)


@functools.partial(jax.jit, static_argnames=("num_heads", "tile",
                                             "interpret"))
def direction_core_pallas(tokens, params, num_heads: int, tile: int = 24,
                          interpret: bool = False):
    # tile sweep on v5e at (40960, 60, 64): 8: 75.1, 16: 76.4, 24: 72.9,
    # 32: 81.7 ms (32 needs the 64 MB vmem budget and loses to scheduling)
    """tokens (Bc, A, E) -> anchor weights (Bc, A) f32."""
    Bc, A, E = tokens.shape
    H = num_heads
    V = params["wm0"].shape[0]
    T = min(tile, Bc)
    pad = (-Bc) % T
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0), (0, 0)))
    Bp = Bc + pad
    x2 = tokens.reshape(Bp * A, E)

    hsz = E // H
    HL = H * A
    mask_rows = np.zeros((HL, E), np.float32)
    for h in range(H):
        mask_rows[h * A:(h + 1) * A, h * hsz:(h + 1) * hsz] = 1.0
    g_ones = np.zeros((HL, H), np.float32)
    for h in range(H):
        g_ones[h * A:(h + 1) * A, h] = 1.0
    mrow = np.full((H, HL), -1e30, np.float32)
    for h in range(H):
        mrow[h, h * A:(h + 1) * A] = 0.0

    cdt = jnp.bfloat16
    inv = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    wb = lambda p: params[p].astype(cdt)
    bb = lambda p: params[p][None].astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, T, A, E, H, V),
        grid=(Bp // T,),
        in_specs=[pl.BlockSpec((T * A, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [inv((E, E))] * 4 + [inv((1, E))]
        + [inv((E, E))] * 3 + [inv((E, V)), inv((1, V))]
        + [inv((V, V)), inv((1, V)), inv((V, V)), inv((1, V)), inv((1, V))]
        + [inv((HL, E)), inv((HL, H)), inv((H, HL)), inv((H, HL))],
        out_specs=pl.BlockSpec((T * A, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * A, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, HL, E), cdt),            # K2
            pltpu.VMEM((T, HL, E), cdt),            # V2
            pltpu.VMEM((T * A, HL), jnp.float32),   # logits
            pltpu.VMEM((T * A, HL), cdt),           # attn
            pltpu.VMEM((T * A, E), jnp.float32),    # attention out rows
        ],
        # the default 16 MB scoped-vmem budget is ~224 KB short for the
        # T=16 phase scratches + softmax temporaries; v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2.astype(cdt),
      wb("wq0"), wb("wk0"), wb("wv0"), wb("wc0"), bb("bc0"),
      wb("wq1"), wb("wk1"), wb("wv1"), wb("wc1"), bb("bc1"),
      wb("wm0"), bb("bm0"), wb("wm1"), bb("bm1"),
      params["wr"].reshape(1, V).astype(jnp.float32),
      jnp.asarray(mask_rows, cdt), jnp.asarray(g_ones, jnp.float32),
      jnp.asarray(g_ones.T.copy(), jnp.float32),
      jnp.asarray(mrow, jnp.float32))
    return out.reshape(Bp, A)[:Bc] + params["br"]
