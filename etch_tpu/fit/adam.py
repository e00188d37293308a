"""Adam-based SMPL fitting (alternative optimizer).

Rebuild of reference `src/models/fit_SMPL_Adam.py:65-230`: same marker
objective as the LM path, minimized with Adam (lr 1e-2) in two stages
(400 + 800 steps), with optional GMM pose prior and mean-shape (L2 beta)
regularization.  Expressed as optax + lax.scan so both stages jit into one
program each.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from etch_tpu.body.smpl import MarkerSubModel, marker_forward
from etch_tpu.fit.smpl_fit import NUM_POSE


@functools.partial(
    jax.jit,
    static_argnames=("steps_stage0", "steps_stage1", "num_betas", "use_mean_shape"),
)
def fit_smpl_adam(
    sub: MarkerSubModel,
    markers: jnp.ndarray,       # (B, M, 3)
    valid: jnp.ndarray,         # (B, M)
    steps_stage0: int = 400,
    steps_stage1: int = 800,
    lr: float = 1e-2,
    num_betas: int = 10,
    use_mean_shape: bool = False,
    mean_shape_w: float = 1e-2,
):
    B, M, _ = markers.shape
    vmask = valid.astype(markers.dtype)[..., None]

    def loss_fn(params, n_free_betas):
        pose, betas, orient, transl = (
            params["pose"], params["betas"], params["orient"], params["transl"]
        )
        frozen = jnp.zeros((B, num_betas - n_free_betas), betas.dtype)
        full_betas = jnp.concatenate([betas[:, :n_free_betas], frozen], axis=1)
        fwd = marker_forward(sub, full_betas, pose, orient, transl)
        loss = jnp.mean(jnp.sum(((markers - fwd) * vmask) ** 2, axis=(1, 2)))
        if use_mean_shape:
            loss = loss + mean_shape_w * jnp.mean(jnp.sum(full_betas ** 2, axis=1))
        return loss

    def run_stage(params, steps, n_free_betas):
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, n_free_betas)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=steps
        )
        return params, losses

    params = {
        "pose": jnp.zeros((B, NUM_POSE), markers.dtype),
        "betas": jnp.zeros((B, num_betas), markers.dtype),
        "orient": jnp.zeros((B, 3), markers.dtype),
        "transl": jnp.zeros((B, 3), markers.dtype),
    }
    params, _ = run_stage(params, steps_stage0, 2)
    params, losses = run_stage(params, steps_stage1, num_betas)
    return {
        "pose": params["pose"],
        "betas": params["betas"],
        "global_orient": params["orient"],
        "transl": params["transl"],
        "final_loss": losses[-1],
    }
