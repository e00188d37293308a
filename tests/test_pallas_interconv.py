"""Fused inter-conv contraction kernel vs the XLA einsum path (interpret
mode on CPU; compiled comparison runs on real TPU via bench tooling)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from etch_tpu.nn.pallas_interconv import (
    interconv_t,
    interconv_t_pallas,
    interconv_t_xla,
)

A, K = 60, 4
SIGMA = 0.0064


def _data(seed, B=2, c=6, nn=8, C=8):
    rng = np.random.RandomState(seed)
    gx = jnp.asarray((rng.randn(B, c, nn, 3) * 0.06).astype(np.float32))
    # anchor-flattened (A*C,) feature rows, as the conv gathers them
    gf = jnp.asarray(rng.randn(B, c, nn, A * C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    rk = jnp.asarray((rng.randn(A * K, 3) * 0.05).astype(np.float32))
    return gx, gf, rk


@pytest.mark.slow
@pytest.mark.parametrize("C", [8, 16])
def test_interconv_kernel_matches_xla(C):
    gx, gf, rk = _data(0, C=C)
    ref = np.asarray(interconv_t_xla(gx, gf, rk, SIGMA, A))
    out = np.asarray(
        interconv_t_pallas(gx, gf, rk, SIGMA, A, interpret=True)
    ).astype(np.float32)
    # kernel computes w on the MXU identity |x-k|^2 = |x|^2 - 2xk + |k|^2 and
    # stores t in bf16 -> tolerance is bf16 ulp on the largest entries
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2
    assert np.mean(np.abs(out - ref)) / scale < 2e-3


@pytest.mark.slow
def test_interconv_kernel_c1_occupancy():
    gx, gf, rk = _data(1, C=1)
    ref = np.asarray(interconv_t_xla(gx, gf, rk, SIGMA, A))
    out = np.asarray(
        interconv_t_pallas(gx, gf, rk, SIGMA, A, interpret=True)
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2


@pytest.mark.slow
def test_interconv_custom_vjp_grads():
    """Backward of the custom-vjp op equals the plain-XLA gradients."""
    gx, gf, rk = _data(2, c=4, C=8)

    def loss_op(a, b):
        return jnp.sum(interconv_t(a, b, rk, SIGMA, A, False) ** 2)

    def loss_ref(a, b):
        return jnp.sum(interconv_t_xla(a, b, rk, SIGMA, A) ** 2)

    g1 = jax.grad(loss_op, argnums=(0, 1))(gx, gf)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(gx, gf)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.slow
def test_interconv_ones_occupancy_path():
    """gf2=None (all-ones occupancy) == explicit ones features."""
    gx, _, rk = _data(3, C=1)
    ones = jnp.ones(gx.shape[:3] + (A,), jnp.float32)
    ref = np.asarray(interconv_t_xla(gx, ones, rk, SIGMA, A))
    out_x = np.asarray(interconv_t_xla(gx, None, rk, SIGMA, A))
    np.testing.assert_allclose(out_x, ref, rtol=1e-5, atol=1e-5)
    out_p = np.asarray(
        interconv_t_pallas(gx, None, rk, SIGMA, A, interpret=True)
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out_p - ref).max() / scale < 2e-2


@pytest.mark.slow
def test_interconv_ones_grads():
    gx, _, rk = _data(4, c=4)

    def loss_op(a):
        return jnp.sum(interconv_t(a, None, rk, SIGMA, A, False) ** 2)

    def loss_ref(a):
        return jnp.sum(interconv_t_xla(a, None, rk, SIGMA, A) ** 2)

    g1 = jax.grad(loss_op)(gx)
    g2 = jax.grad(loss_ref)(gx)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("C", [1, 8])
def test_interconv_fast_w_close(C):
    """fast_w (1-pass bf16 kernel-weight matmul, bf16-inference only) stays
    within bf16-rounding distance of the exact path: w errs by at most a few
    ulp near the relu support edge, which perturbs t by O(1e-2) relative."""
    gx, gf, rk = _data(5, C=C)
    ref = np.asarray(interconv_t_xla(gx, gf, rk, SIGMA, A))
    out = np.asarray(
        interconv_t_pallas(gx, gf, rk, SIGMA, A, interpret=True, fast_w=True)
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 6e-2
    assert np.mean(np.abs(out - ref)) / scale < 6e-3
    # occupancy variant (gf2=None) under fast_w
    ref1 = np.asarray(interconv_t_xla(gx, None, rk, SIGMA, A))
    out1 = np.asarray(
        interconv_t_pallas(gx, None, rk, SIGMA, A, interpret=True,
                           fast_w=True)
    ).astype(np.float32)
    scale1 = np.abs(ref1).max() + 1e-9
    assert np.abs(out1 - ref1).max() / scale1 < 6e-2
