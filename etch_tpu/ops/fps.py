"""Furthest point sampling on dense batched clouds.

TPU-native replacement for the two CUDA FPS kernels in the reference
(offset-batched `external/pointops/src/sampling/sampling_cuda_kernel.cu:5-171`
and dense-batched `external/vgtk/vgtk/cuda/grouping_cuda_kernel.cu:340-430`).
Both start from point 0 and greedily pick the point with maximal min-distance
to the selected set; we reproduce those semantics.

FPS is inherently sequential over the m selected centers; the XLA path keeps
the running min-distance vector as loop carry (it lives in VMEM on TPU for
typical N) and does one distance + argmax per step, all fused by XLA.  A
Pallas variant that additionally pins xyz in VMEM lives in
etch_tpu/ops/pallas_fps.py and is selected automatically on TPU.

`lazy` mirrors the reference's `lazy_sample` shortcut that returns arange
instead of true FPS (`external/vgtk/vgtk/pc/sample.py:75-79`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("m",))
def _fps_xla(xyz: jnp.ndarray, m: int) -> jnp.ndarray:
    def one_cloud(pts):  # (N, 3)
        N = pts.shape[0]

        def body(i, state):
            mind, idx = state
            last = idx[i - 1]
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            mind = jnp.minimum(mind, d)
            idx = idx.at[i].set(jnp.argmax(mind).astype(jnp.int32))
            return mind, idx

        mind0 = jnp.full((N,), jnp.inf, dtype=pts.dtype)
        idx0 = jnp.zeros((m,), dtype=jnp.int32)  # first center = point 0
        _, idx = jax.lax.fori_loop(1, m, body, (mind0, idx0))
        return idx

    return jax.vmap(one_cloud)(xyz)


def fps(xyz: jnp.ndarray, m: int, lazy: bool = False) -> jnp.ndarray:
    """Select m centers per cloud.  xyz: (B, N, 3) -> idx (B, m) int32."""
    B, N, _ = xyz.shape
    if lazy or N == m:
        return jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (B, m))
    if m > N:
        raise ValueError(f"fps: m={m} > N={N}")
    # Pallas path for large clouds on TPU; tiny clouds stay on the XLA loop
    # (negligible cost there, and Mosaic miscompiles some sub-128 configs).
    import jax as _jax
    if N >= 256 and _jax.default_backend() == "tpu":
        from etch_tpu.ops import _dispatch
        try:
            from etch_tpu.ops.pallas_fps import fps_pallas
            out = fps_pallas(xyz, m)
            _dispatch.record("fps", "pallas")
            return out
        except Exception as e:  # trace-time Mosaic/shape failures
            _dispatch.warn_fallback("fps", e)
            _dispatch.record("fps", "xla")
    return _fps_xla(xyz, m)
