"""Two-stage SMPL fitting to predicted markers.

Rebuild of reference `src/models/fit_SMPL.py:68-269`:
  stage 0: optimize pose(69) + first 2 betas + global orient(3) + transl(3),
           30 LM iters, step 0.5, damping 0.01
  stage 1: optimize pose + all 10 betas + orient + transl,
           50 LM iters, step 0.2, damping 1e-3 (Theseus default when the
           reference passes none at fit_SMPL.py:249)
Residual: (pred_markers - forward_markers) * valid_mask, flattened (86*3).

TPU design: the residual uses a marker-restricted SMPL submodel (86 vertices
instead of 6890 — see etch_tpu.body.smpl.marker_submodel), everything jits
into a single program with a fori_loop, and the batch dimension is vmapped.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.body.smpl import (
    SMPLModel,
    MarkerSubModel,
    marker_forward,
    marker_submodel,
    smpl_forward,
)
from etch_tpu.fit.lm import levenberg_marquardt

NUM_POSE = 69  # 23 joints * 3


def _unpack(x, n_betas):
    pose = x[:NUM_POSE]
    betas = x[NUM_POSE : NUM_POSE + n_betas]
    orient = x[NUM_POSE + n_betas : NUM_POSE + n_betas + 3]
    transl = x[NUM_POSE + n_betas + 3 :]
    return pose, betas, orient, transl


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps_stage0", "steps_stage1", "num_betas",
    ),
)
def fit_smpl_params(
    sub: MarkerSubModel,
    markers: jnp.ndarray,     # (B, M, 3)
    valid: jnp.ndarray,       # (B, M) bool
    steps_stage0: int = 30,
    steps_stage1: int = 50,
    lr_stage0: float = 0.5,
    lr_stage1: float = 0.2,
    damping_stage0: float = 0.01,
    damping_stage1: float = 1e-3,
    num_betas: int = 10,
):
    """Returns dict(pose (B,69), betas (B,10), global_orient (B,3),
    transl (B,3)) fitted per batch element."""
    B, M, _ = markers.shape
    vmask = valid.astype(markers.dtype)[..., None]  # (B, M, 1)

    def residual(x, target, mask, n_free_betas):
        pose, b_free, orient, transl = _unpack(x, n_free_betas)
        betas = jnp.concatenate(
            [b_free, jnp.zeros((num_betas - n_free_betas,), x.dtype)]
        )
        fwd = marker_forward(
            sub, betas[None], pose[None], orient[None], transl[None]
        )[0]
        return ((target - fwd) * mask).reshape(-1)

    # ---- stage 0: pose + 2 betas ----
    def solve0(target, mask):
        x0 = jnp.zeros((NUM_POSE + 2 + 6,), markers.dtype)
        fn = lambda x: residual(x, target, mask, 2)
        return levenberg_marquardt(fn, x0, steps_stage0, lr_stage0, damping_stage0)

    x_s0 = jax.vmap(solve0)(markers, vmask)  # (B, 69+2+6)

    # ---- stage 1: pose + all betas, warm-started ----
    def solve1(x_prev, target, mask):
        pose, b2, orient, transl = _unpack(x_prev, 2)
        x0 = jnp.concatenate(
            [pose, b2, jnp.zeros((num_betas - 2,), x_prev.dtype), orient, transl]
        )
        fn = lambda x: residual(x, target, mask, num_betas)
        return levenberg_marquardt(fn, x0, steps_stage1, lr_stage1, damping_stage1)

    x_s1 = jax.vmap(solve1)(x_s0, markers, vmask)

    pose, betas, orient, transl = jax.vmap(lambda x: _unpack(x, num_betas))(x_s1)
    return {
        "pose": pose,
        "betas": betas,
        "global_orient": orient,
        "transl": transl,
    }


def fit_smpl(
    model: SMPLModel,
    marker_vids: np.ndarray,
    inner_points: jnp.ndarray,   # (B, K, 3)
    part_labels: jnp.ndarray,    # (B, K)
    confidences: jnp.ndarray,    # (B, K, 1)
    steps_stage0: int = 30,
    steps_stage1: int = 50,
    lr_stage0: float = 0.5,
    lr_stage1: float = 0.2,
):
    """End-to-end: inner points -> markers -> fitted SMPL.

    Returns (vertices (B,V,3), params dict, markers (B,M,3), valid (B,M),
    joints (B,45,3)) — the same information surface as reference
    fit_SMPL.py:68-269 (which returns trimesh objects + numpy arrays).
    """
    from etch_tpu.fit.markers import extract_markers

    num_markers = len(marker_vids)
    markers, valid = extract_markers(
        inner_points, part_labels, confidences, num_markers=num_markers
    )
    sub = marker_submodel(model, marker_vids)
    params = fit_smpl_params(
        sub, markers, valid,
        steps_stage0=steps_stage0, steps_stage1=steps_stage1,
        lr_stage0=lr_stage0, lr_stage1=lr_stage1,
        num_betas=int(model.num_betas),
    )
    verts, joints = smpl_forward(
        model, params["betas"], params["pose"],
        params["global_orient"], params["transl"],
    )
    return verts, params, markers, valid, joints
