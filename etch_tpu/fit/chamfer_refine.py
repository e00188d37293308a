"""Chamfer post-refinement of a fitted SMPL against the scan point cloud.

Rebuild of reference `scripts/experiment_scripts/chamfer_refine.py:247-298`:
starting from fitted params, minimize single-direction (smpl -> scan) chamfer
distance + GMM pose prior (1e-8) + beta L2 (0.2) with Adam lr 2e-2 decayed
linearly over 500 iterations.

TPU design: the chamfer nearest-neighbor uses the tiled-MXU kNN; the whole
refinement is one lax.scan program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from etch_tpu.body.smpl import SMPLModel, smpl_forward
from etch_tpu.fit.prior import GMMPrior
from etch_tpu.ops.knn import knn


@functools.partial(jax.jit, static_argnames=("iterations", "bidirectional"))
def chamfer_refine(
    model: SMPLModel,
    scan_points: jnp.ndarray,    # (P, 3)
    init_pose: jnp.ndarray,      # (1, 69)
    init_betas: jnp.ndarray,     # (1, 10)
    init_orient: jnp.ndarray,    # (1, 3)
    init_transl: jnp.ndarray,    # (1, 3)
    prior: Optional[GMMPrior] = None,
    iterations: int = 500,
    lr: float = 2e-2,
    beta_reg: float = 0.2,
    prior_w: float = 1e-8,
    bidirectional: bool = False,
):
    params = {
        "pose": init_pose, "betas": init_betas,
        "orient": init_orient, "transl": init_transl,
    }
    scan = scan_points[None]  # (1, P, 3)

    def loss_fn(p):
        verts, _ = smpl_forward(
            model, p["betas"], p["pose"], p["orient"], p["transl"]
        )
        _, d_s2v = knn(verts, scan, 1)        # smpl -> scan
        loss = jnp.mean(d_s2v)
        if bidirectional:
            _, d_v2s = knn(scan, verts, 1)
            loss = loss + jnp.mean(d_v2s)
        loss = loss + beta_reg * jnp.mean(p["betas"] ** 2)
        if prior is not None:
            loss = loss + prior_w * jnp.mean(prior(p["pose"]))
        return loss

    tx = optax.adam(1.0)  # lr applied manually for the linear decay

    def step(carry, i):
        p, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        cur_lr = lr * (iterations - i) / iterations
        p = jax.tree.map(lambda a, u: a + cur_lr * u, p, updates)
        return (p, opt_state), loss

    opt_state = tx.init(params)
    (params, _), losses = jax.lax.scan(
        step, (params, opt_state), jnp.arange(iterations)
    )
    params["final_loss"] = losses[-1]
    return params
