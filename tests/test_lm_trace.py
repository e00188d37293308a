"""LM ⇄ Theseus parity: the jitted f32 LM (fit/lm.py) must reproduce the
per-iteration residual-norm trace of the independent float64 numpy oracle
implementing the reference's two-stage Theseus setup
(fit_SMPL.py:157-255; see tests/fixtures/gen_lm_trace.py for the oracle and
the stage-1 damping provenance)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etch_tpu.body.smpl import marker_forward, marker_submodel, synthetic_body_model
from etch_tpu.fit.lm import levenberg_marquardt_with_history

NUM_POSE = 69
N_BETAS = 10
TRACE = os.path.join(os.path.dirname(__file__), "fixtures", "lm_trace.npz")


def test_lm_matches_theseus_oracle_trace():
    data = np.load(TRACE)
    target = jnp.asarray(data["target"], jnp.float32)
    mask = jnp.asarray(data["valid"].astype(np.float32)[:, None])

    model = synthetic_body_model(n_verts=300)
    vids = np.linspace(0, 299, 86).astype(np.int32)
    sub = marker_submodel(model, vids)

    def residual(x, n_free):
        pose = x[:NUM_POSE]
        betas = jnp.zeros((N_BETAS,), x.dtype)
        betas = betas.at[:n_free].set(x[NUM_POSE:NUM_POSE + n_free])
        orient = x[NUM_POSE + n_free:NUM_POSE + n_free + 3]
        transl = x[NUM_POSE + n_free + 3:]
        fwd = marker_forward(
            sub, betas[None], pose[None], orient[None], transl[None]
        )[0]
        return ((target - fwd) * mask).reshape(-1)

    # stage 0: 30 iters, step 0.5, damping 0.01
    x0 = jnp.zeros((NUM_POSE + 2 + 6,), jnp.float32)
    x_s0, norms0 = jax.jit(
        lambda x: levenberg_marquardt_with_history(
            lambda y: residual(y, 2), x, 30, 0.5, 0.01
        )
    )(x0)
    # stage 1: warm start, 50 iters, step 0.2, damping 1e-3 (Theseus default)
    x1 = jnp.concatenate([
        x_s0[:NUM_POSE + 2], jnp.zeros((N_BETAS - 2,), jnp.float32),
        x_s0[NUM_POSE + 2:],
    ])
    x_s1, norms1 = jax.jit(
        lambda x: levenberg_marquardt_with_history(
            lambda y: residual(y, N_BETAS), x, 50, 0.2, 1e-3
        )
    )(x1)

    ref0 = data["norms_stage0"]
    ref1 = data["norms_stage1"]
    assert norms0.shape == ref0.shape and norms1.shape == ref1.shape

    # Early iterations carry the optimization signal — they must match to
    # rtol 1e-4 (the oracle is f64 with FD Jacobians; we are f32 with exact
    # Jacobians).  Near the ~3mm-residual plateau, absolute agreement at the
    # few-micron level is the meaningful statement.
    np.testing.assert_allclose(
        np.asarray(norms0), ref0, rtol=1e-4, atol=2e-5,
        err_msg="stage-0 residual trace diverges from Theseus oracle",
    )
    np.testing.assert_allclose(
        np.asarray(norms1), ref1, rtol=1e-4, atol=2e-5,
        err_msg="stage-1 residual trace diverges from Theseus oracle",
    )
    # parameter endpoint agreement
    np.testing.assert_allclose(
        np.asarray(x_s1), data["x_final_stage1"], atol=5e-3,
    )
