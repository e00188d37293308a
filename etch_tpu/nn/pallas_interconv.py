"""Fused inter-SO(3)-conv contraction as a Pallas TPU kernel.

The inter-conv core computes, per sampled center p with nn grouped neighbors:

    w[p,n,a,k] = relu(1 - |x_pn - R_a kappa_k|^2 / sigma)   (a: 60 anchors,
                                                             k: 24 kernel pts)
    t[p,a,k,c] = sum_n w[p,n,a,k] * gf[p,n,a,c]

(reference `external/vgtk/vgtk/so3conv/functional.py:286-324` computes w, and
`:61-67` the einsum).  Under XLA this is a batched dot_general with batch dims
(b, p, a) and a (24 x 32, 64-deep) matmul per batch element — a shape the MXU
runs at ~1% utilization — plus the materialization of w ((B, c, nn, A, K),
hundreds of MB per chunk) and layout transposes around the dot.  Measured:
~180 ms for the 2500-center conv at production shapes.

The kernel keeps everything in VMEM per tile of T centers:

  * weights via one MXU matmul instead of a 12-pass elementwise chain:
      w = relu( (2/sigma) x.rk  +  (1 - |rk|^2/sigma)  -  |x|^2/sigma )
    The x.rk term is an f32 (T*nn, 3)@(3, A*K) dot (HIGHEST precision: the
    relu edge needs ~1e-4 absolute accuracy in d2/sigma, beyond bf16).
    fast_w (bf16-streaming inference only) runs it as ONE bf16 DEFAULT
    pass instead of six — see _w_matmul.
  * the per-(center, anchor) contraction packs G anchors per MXU call:
    (nn, G*K)^T @ (nn, G*C) -> (G*K, G*C), of which the G diagonal (K, C)
    blocks are extracted into the (T, A, K, C) output tile.  The off-diagonal
    FLOPs are the price of MXU-shaped matmuls — G trades waste against
    per-call overhead; the v5e sweep puts the optimum at G=4 (5.5 ms vs
    6.2 at G=12 per 512-center C=32 chunk; G=2 collapses to 11.9).
  * output is written bf16 (it feeds the bf16 (K*C -> C_out) projection).

The backward pass reuses the XLA einsum path via custom_vjp: training runs
the fast kernel forward and an XLA VJP (the w recompute stays chunk-local
because the caller wraps chunks in jax.checkpoint).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 4        # centers per grid step (2 for wide channels, see below)
_G = 4        # anchors per MXU call: measured optimum on v5e — smaller G
              # means less off-diagonal FLOP waste in the packed dot; below
              # G=4 per-dot overhead dominates (G=2 is 2x slower than G=4)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def interconv_t_xla(gx, gf2, rk, sigma, A):
    """Reference XLA path (and VJP body).

    gx:  (B, c, nn, 3) f32 relative neighbor coords
    gf2: (B, c, nn, A*C) neighbor features, anchor-flattened rows (bf16 on
         the streaming path — rows are gathered pre-flattened so no physical
         retiling sits between the gather and this contraction), or None
         for all-ones occupancy input (C == 1): the contraction is then a
         plain neighbor-sum of the weights (reference functional.py:70-89
         makes the first conv's input features identically 1, and the
         ball-query repeat-fill only ever emits real indices, so every
         gathered feature is exactly 1).
    rk:  (A*K, 3) anchor-rotated kernel points
    -> t: (B, c, A, K, C) f32
    """
    B, c, nn, _ = gx.shape
    K = rk.shape[0] // A
    diff = gx[..., None, :] - rk[None, None, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)                       # (B,c,nn,A*K)
    w = jax.nn.relu(1.0 - d2 / sigma)
    if gf2 is None:
        return jnp.sum(w, axis=2).reshape(B, c, A, K, 1)
    C = gf2.shape[3] // A
    gf = gf2.reshape(B, c, nn, A, C)
    w = w.reshape(B, c, nn, A, K).astype(gf.dtype)
    return jax.lax.dot_general(
        w, gf,
        dimension_numbers=(((2,), (2,)), ((0, 1, 3), (0, 1, 3))),
        preferred_element_type=jnp.float32,
    )                                                        # (B,c,A,K,C)


def _w_matmul(x, rks_ref, fast_w):
    """m = x @ rks: (T*nn, 3) @ (3, A*K) -> f32 (T*nn, A*K).

    Training / exact path: f32 operands at HIGHEST (6 MXU passes) — the
    relu edge needs ~1e-4 absolute accuracy in d2/sigma, beyond bf16.
    fast_w (bf16-streaming inference): ONE bf16 pass at DEFAULT — the
    measured kernel floor is this matmul's 6-pass latency (~3.1 of 6.3 ms
    per C=32 chunk, DESIGN.md round-4), and inference quality is gated on
    marker/V2V metrics, not the equivariance tolerance.  The wrapper
    pre-casts rks to bf16; x is cast per-tile (VPU, (T*nn, 3) is tiny).
    """
    if fast_w:
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), rks_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        x, rks_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _kernel(T, G, nn, A, K, C, fast_w, gx_ref, gf_ref, rks_ref, al_ref,
            o_ref):
    x = gx_ref[0]                                            # (T*nn, 3)
    bx = -(x[:, 0:1] ** 2 + x[:, 1:2] ** 2 + x[:, 2:3] ** 2)
    m = _w_matmul(x, rks_ref, fast_w)                        # (T*nn, A*K)
    # rks/al/bx are pre-scaled by 1/sigma (see wrapper)
    w = jnp.maximum(m + bx * al_ref[1:2, :1] + al_ref[0:1, :], 0.0)
    # contraction dtype follows the streamed feature dtype (bf16 only when
    # the caller streams bf16); f32 features keep a genuinely full-precision
    # dot — DEFAULT on f32 operands would silently run single-pass bf16 on
    # the MXU, breaking the strict-f32 training policy the wrapper promises
    w = w.astype(gf_ref.dtype)
    contract_prec = (jax.lax.Precision.DEFAULT
                     if gf_ref.dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
    gf = gf_ref[0]                                           # (T*nn, A*C)
    NG = A // G
    for t in range(T):
        for g in range(NG):
            wblk = w[t * nn:(t + 1) * nn, g * G * K:(g + 1) * G * K]
            fblk = gf[t * nn:(t + 1) * nn, g * G * C:(g + 1) * G * C]
            prod = jax.lax.dot_general(
                wblk, fblk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=contract_prec,
            )                                                # (G*K, G*C)
            for j in range(G):
                o_ref[0, t, g * G + j] = (
                    prod[j * K:(j + 1) * K, j * C:(j + 1) * C]
                    .astype(o_ref.dtype)
                )


def _kernel_ones(T, nn, A, K, fast_w, gx_ref, rks_ref, al_ref, o_ref):
    """All-ones occupancy features: t = sum_n w — no feature input at all."""
    x = gx_ref[0]
    bx = -(x[:, 0:1] ** 2 + x[:, 1:2] ** 2 + x[:, 2:3] ** 2)
    m = _w_matmul(x, rks_ref, fast_w)
    w = jnp.maximum(m + bx * al_ref[1:2, :1] + al_ref[0:1, :], 0.0)
    for t in range(T):
        o_ref[0, t] = jnp.sum(w[t * nn:(t + 1) * nn, :], axis=0,
                              keepdims=True)[0].astype(o_ref.dtype)


def _kernel_ones_proj(T, nn, A, K, Co, fast_w, gx_ref, rks_ref, al_ref,
                      wbd_ref, o_ref):
    """Occupancy features + fused (K -> Co) projection: out[t, a*Co+o] =
    sum_k sum_n w[t, n, a*K+k] * W[k, o].  The projection is a single
    (T, A*K) @ (A*K, A*Co) dot against a block-diagonal expansion of W —
    the off-anchor blocks are structurally zero.  Removes the XLA-side
    projection + concat read-modify-write chains over the (B, c, A, K)
    intermediate (~10.5 ms/forward at B=8, trace r5)."""
    x = gx_ref[0]
    bx = -(x[:, 0:1] ** 2 + x[:, 1:2] ** 2 + x[:, 2:3] ** 2)
    m = _w_matmul(x, rks_ref, fast_w)
    w = jnp.maximum(m + bx * al_ref[1:2, :1] + al_ref[0:1, :], 0.0)
    rows = [jnp.sum(w[t * nn:(t + 1) * nn, :], axis=0, keepdims=True)
            for t in range(T)]
    wsum = jnp.concatenate(rows, axis=0)                     # (T, A*K)
    o_ref[0] = jax.lax.dot_general(
        wsum.astype(wbd_ref.dtype), wbd_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(o_ref.dtype)


def _kernel_c1(T, nn, A, K, fast_w, gx_ref, gf_ref, rks_ref, al_ref, e_ref,
               o_ref):
    """C == 1 case (occupancy input features): the contraction degenerates to
    a weighted column-sum of w.  The (a -> a*K+k) lane expansion of gf is a
    one-hot matmul (pltpu.repeat tiles rather than element-repeats)."""
    x = gx_ref[0]
    bx = -(x[:, 0:1] ** 2 + x[:, 1:2] ** 2 + x[:, 2:3] ** 2)
    m = _w_matmul(x, rks_ref, fast_w)
    w = jnp.maximum(m + bx * al_ref[1:2, :1] + al_ref[0:1, :], 0.0)
    gf = gf_ref[0]                                           # (T*nn, A)
    gf_exp = jax.lax.dot_general(
        gf, e_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (T*nn, A*K)
    z = w * gf_exp
    for t in range(T):
        o_ref[0, t] = jnp.sum(z[t * nn:(t + 1) * nn, :], axis=0,
                              keepdims=True)[0].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sigma", "A", "out_dtype", "interpret", "tile", "group",
                     "fast_w"),
)
def interconv_t_pallas(gx, gf2, rk, sigma, A, out_dtype=jnp.bfloat16,
                       interpret: bool = False, tile: int | None = None,
                       group: int | None = None, fast_w: bool = False,
                       proj_w=None):
    """Pallas path.  Same contract as interconv_t_xla (t may be bf16).

    proj_w (K, Co), occupancy path only: fuse the output projection into
    the kernel (bf16, DEFAULT precision — inference streaming only); the
    result is then (B, c, A*Co) instead of the (B, c, A, K, 1) tensor.
    """
    B, c, nn, _ = gx.shape
    C = 1 if gf2 is None else gf2.shape[3] // A
    AK = rk.shape[0]
    K = AK // A
    G = group or _G
    # C==1 writes (T, A*K) blocks whose second-to-last dim must be 8-aligned;
    # wide channels (C>=64) prefer fewer centers per step (sweep in
    # docs/DESIGN.md)
    T = tile or (8 if C == 1 else (2 if C >= 64 else _T))
    # pad centers to a multiple of T (harmless garbage rows, sliced off)
    pad = (-c) % T
    if pad:
        gx = jnp.pad(gx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if gf2 is not None:
            gf2 = jnp.pad(gf2, ((0, 0), (0, pad), (0, 0), (0, 0)))
    cp = c + pad

    inv_sigma = 1.0 / float(sigma)
    rks = rk.T.astype(jnp.float32) * (2.0 * inv_sigma)       # (3, A*K)
    if fast_w:
        rks = rks.astype(jnp.bfloat16)
    # al row 0: per-(a,k) constant 1 - |rk|^2/sigma; row 1 lane 0: 1/sigma
    al0 = 1.0 - jnp.sum(rk * rk, axis=1)[None, :] * inv_sigma
    al = jnp.concatenate(
        [al0, jnp.full((1, AK), inv_sigma, jnp.float32)], axis=0
    )

    gx2 = gx.reshape(B, cp * nn, 3).astype(jnp.float32)
    extra_in, extra_specs = [], []
    if gf2 is None and proj_w is not None:
        Co = proj_w.shape[1]
        # block-diagonal (A*K, A*Co) expansion of W (K, Co)
        wbd = (jnp.eye(A, dtype=jnp.float32)[:, None, :, None]
               * proj_w.astype(jnp.float32)[None, :, None, :]
               ).reshape(AK, A * Co).astype(jnp.bfloat16)
        mids = [gx2]
        kern = functools.partial(_kernel_ones_proj, T, nn, A, K, Co, fast_w)
        out_shape = jax.ShapeDtypeStruct((B, cp, A * Co), out_dtype)
        out_spec = pl.BlockSpec((1, T, A * Co), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        gf_spec = None
        extra_in = [wbd]
        extra_specs = [pl.BlockSpec((AK, A * Co), lambda b, i: (0, 0),
                                    memory_space=pltpu.VMEM)]
    elif gf2 is None:
        mids = [gx2]
        kern = functools.partial(_kernel_ones, T, nn, A, K, fast_w)
        out_shape = jax.ShapeDtypeStruct((B, cp, AK), out_dtype)
        out_spec = pl.BlockSpec((1, T, AK), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        gf_spec = None
    elif C == 1:
        gfk = gf2.reshape(B, cp * nn, A).astype(jnp.float32)
        mids = [gx2, gfk]
        kern = functools.partial(_kernel_c1, T, nn, A, K, fast_w)
        out_shape = jax.ShapeDtypeStruct((B, cp, AK), out_dtype)
        out_spec = pl.BlockSpec((1, T, AK), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
        gf_spec = pl.BlockSpec((1, T * nn, A), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)
        expand = jnp.repeat(jnp.eye(A, dtype=jnp.float32), K, axis=1)
        extra_in = [expand]                                  # (A, A*K)
        extra_specs = [pl.BlockSpec((A, AK), lambda b, i: (0, 0),
                                    memory_space=pltpu.VMEM)]
    else:
        if A % G:
            raise ValueError(f"A={A} not divisible by anchor group {G}")
        gfk = gf2.reshape(B, cp * nn, A * C)
        mids = [gx2, gfk]
        kern = functools.partial(_kernel, T, G, nn, A, K, C, fast_w)
        out_shape = jax.ShapeDtypeStruct((B, cp, A, K, C), out_dtype)
        out_spec = pl.BlockSpec((1, T, A, K, C), lambda b, i: (b, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        gf_spec = pl.BlockSpec((1, T * nn, A * C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM)

    gx_spec = pl.BlockSpec((1, T * nn, 3), lambda b, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    mid_specs = [gx_spec] if gf_spec is None else [gx_spec, gf_spec]
    t = pl.pallas_call(
        kern,
        grid=(B, cp // T),
        in_specs=mid_specs + [
            pl.BlockSpec((3, AK), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, AK), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        # the restarted axon compiler (2026-08-20) accounts kernel stack
        # tighter than before: the f32 training variant now overflows the
        # default 16 MB scoped-vmem budget by ~656 KB.  v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*mids, rks, al, *extra_in)
    if C == 1 and proj_w is None:
        t = t.reshape(B, cp, A, K, 1)
    return t[:, :c]


def _interconv_primal(gx, gf2, rk, sigma, A, use_pallas, fast_w):
    if use_pallas:
        # output dtype follows the streamed feature dtype: bf16 features ->
        # bf16 t (halves the write bandwidth of the largest intermediate),
        # f32 features (or occupancy) -> f32 t (strict-f32 training policy)
        bf16_in = gf2 is not None and gf2.dtype == jnp.bfloat16
        od = jnp.bfloat16 if bf16_in else jnp.float32
        return interconv_t_pallas(
            gx, gf2, rk, sigma, A, out_dtype=od, fast_w=fast_w
        ).astype(jnp.float32)
    return interconv_t_xla(gx, gf2, rk, sigma, A)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def interconv_t(gx, gf2, rk, sigma, A, use_pallas, fast_w=False):
    """Differentiable inter-conv contraction core: (gx, gf2) -> t (B,c,A,K,C).

    gf2 carries anchor-flattened (A*C,) feature rows — the caller gathers
    them in this layout so no physical retiling sits between the gather and
    the kernel.  Forward runs the fused Pallas kernel on TPU
    (use_pallas=True), the XLA einsum elsewhere; backward always uses the
    XLA VJP.  rk gets no gradient (it is a static geometry constant).

    NOTE: jax.custom_vjp runs *this* body when no derivative is requested and
    the fwd rule under differentiation — both must dispatch identically.
    """
    return _interconv_primal(gx, gf2, rk, sigma, A, use_pallas, fast_w)


def _interconv_t_fwd(gx, gf2, rk, sigma, A, use_pallas, fast_w=False):
    return (_interconv_primal(gx, gf2, rk, sigma, A, use_pallas, fast_w),
            (gx, gf2, rk))


def _interconv_t_bwd(sigma, A, use_pallas, fast_w, res, g):
    gx, gf2, rk = res
    if gf2 is None:
        _, vjp = jax.vjp(
            lambda a: interconv_t_xla(a, None, rk, sigma, A), gx
        )
        (dgx,) = vjp(g.astype(jnp.float32))
        return dgx, None, jnp.zeros_like(rk)
    _, vjp = jax.vjp(
        lambda a, b: interconv_t_xla(a, b, rk, sigma, A), gx, gf2
    )
    dgx, dgf2 = vjp(g.astype(jnp.float32))
    return dgx, dgf2, jnp.zeros_like(rk)


interconv_t.defvjp(_interconv_t_fwd, _interconv_t_bwd)


def _ones_proj_xla(gx, rk, sigma, A, w):
    t = interconv_t_xla(gx, None, rk, sigma, A)              # (B,c,A,K,1)
    return jax.lax.dot_general(
        t[..., 0], w,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (B,c,A,Co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def interconv_ones_proj(gx, w, rk, sigma, A, fast_w=False):
    """Occupancy contraction + (K -> Co) projection fused in one kernel
    (bf16 streaming inference); XLA composite elsewhere and for backward.

    fast_w: 1-pass bf16 w-matmul.  Unlike the C>=32 contraction kernel —
    where ANY change to the w matmul collapses Mosaic's schedule (four
    reverted attempts, DESIGN.md r4) — the occupancy kernel has no
    contraction dots to disturb: measured 4.92 -> 2.24 ms per production
    chunk-op, median rel err 0.25% (relu-edge outliers at small
    magnitudes)."""
    if jax.default_backend() == "tpu":
        B, c = gx.shape[:2]
        Co = w.shape[1]
        out = interconv_t_pallas(gx, None, rk, sigma, A,
                                 out_dtype=jnp.bfloat16, proj_w=w,
                                 fast_w=fast_w)
        return out.reshape(B, c, A, Co).astype(jnp.float32)
    return _ones_proj_xla(gx, rk, sigma, A, w)


def _ones_proj_fwd(gx, w, rk, sigma, A, fast_w=False):
    return (interconv_ones_proj(gx, w, rk, sigma, A, fast_w),
            (gx, w, rk))


def _ones_proj_bwd(sigma, A, fast_w, res, g):
    gx, w, rk = res
    _, vjp = jax.vjp(lambda a, b: _ones_proj_xla(a, rk, sigma, A, b), gx, w)
    dgx, dw = vjp(g.astype(jnp.float32))
    return dgx, dw, jnp.zeros_like(rk)


interconv_ones_proj.defvjp(_ones_proj_fwd, _ones_proj_bwd)
