"""Generate the Levenberg–Marquardt parity trace (lm_trace.npz).

Independent float64 NUMPY oracle of the reference's two-stage Theseus fit
(`/root/reference/src/models/fit_SMPL.py:157-255`):

  update rule    delta = solve(J^T J + damping * I, -J^T r)
                 x    <- x + step_size * delta
  stage 0        30 iters, step 0.5, damping 0.01  (explicit kwarg,
                 fit_SMPL.py:200)
  stage 1        50 iters, step 0.2, damping 1e-3  (Theseus
                 LevenbergMarquardt.compute_delta signature default — eval
                 passes no damping at fit_SMPL.py:249; spherical damping
                 `AtA + damping*I` since ellipsoidal_damping defaults False)

Everything here is independent of etch_tpu.fit.lm: the marker LBS forward is
re-derived in numpy from the SMPL equations, the Jacobian comes from central
finite differences in float64, and the linear solve is numpy.  The jitted
f32 JAX LM (fit/lm.py) must reproduce the per-iteration residual norms to
rtol 1e-4 (tests/test_lm_trace.py).

Run:  JAX_PLATFORMS=cpu python tests/fixtures/gen_lm_trace.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

NUM_POSE = 69
N_BETAS = 10


def np_rodrigues(aa):
    """(..., 3) axis-angle -> (..., 3, 3), plain numpy f64."""
    aa = np.asarray(aa, np.float64)
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-12
    k = np.where(theta > 0, aa / np.maximum(theta, 1e-300), 0.0)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    z = np.zeros_like(kx)
    K = np.stack([
        np.stack([z, -kz, ky], -1),
        np.stack([kz, z, -kx], -1),
        np.stack([-ky, kx, z], -1),
    ], -2)
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    eye = np.broadcast_to(np.eye(3), K.shape)
    R = eye + s * K + (1 - c) * (K @ K)
    R[small] = np.eye(3)
    return R


def np_marker_forward(sub, betas, pose, orient, transl):
    """Single-instance (no batch) marker LBS forward, f64 numpy."""
    m_shaped = sub["m_template"] + sub["m_shapedirs"] @ betas        # (M,3)
    J = sub["J_template"] + sub["J_shapedirs"] @ betas               # (24,3)
    full_pose = np.concatenate([orient, pose]).reshape(24, 3)
    R = np_rodrigues(full_pose)                                      # (24,3,3)
    pose_feat = (R[1:] - np.eye(3)).reshape(207)
    M = sub["m_template"].shape[0]
    m_posed = m_shaped + (pose_feat @ sub["m_posedirs"]).reshape(M, 3)

    parents = sub["parents"]
    J_rel = J.copy()
    J_rel[1:] -= J[parents[1:]]
    world = np.zeros((24, 4, 4))
    for kjoint in range(24):
        T = np.eye(4)
        T[:3, :3] = R[kjoint]
        T[:3, 3] = J_rel[kjoint]
        world[kjoint] = T if kjoint == 0 else world[parents[kjoint]] @ T
    A = world.copy()
    A[:, :3, 3] -= np.einsum("kij,kj->ki", world[:, :3, :3], J)

    T = np.einsum("mk,kij->mij", sub["m_weights"], A)                # (M,4,4)
    m_h = np.concatenate([m_posed, np.ones((M, 1))], -1)
    return np.einsum("mij,mj->mi", T, m_h)[:, :3] + transl


def fd_jacobian(f, x, h=1e-6):
    """Central-difference Jacobian, f64: (R, P)."""
    r0 = f(x)
    J = np.zeros((r0.size, x.size))
    for i in range(x.size):
        xp = x.copy(); xp[i] += h
        xm = x.copy(); xm[i] -= h
        J[:, i] = (f(xp) - f(xm)) / (2 * h)
    return J


def lm_oracle(f, x0, steps, step_size, damping):
    """Reference-formula LM; returns (x, norms (steps+1,))."""
    x = x0.copy()
    norms = []
    eye = np.eye(x.size)
    for _ in range(steps):
        r = f(x)
        norms.append(np.linalg.norm(r))
        J = fd_jacobian(f, x)
        delta = np.linalg.solve(J.T @ J + damping * eye, -(J.T @ r))
        x = x + step_size * delta
    norms.append(np.linalg.norm(f(x)))
    return x, np.array(norms)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from etch_tpu.body.smpl import marker_submodel, synthetic_body_model

    model = synthetic_body_model(n_verts=300)
    vids = np.linspace(0, 299, 86).astype(np.int32)
    sub_jax = marker_submodel(model, vids)
    sub = {
        "m_template": np.asarray(sub_jax.m_template, np.float64),
        "m_shapedirs": np.asarray(sub_jax.m_shapedirs, np.float64),
        "m_posedirs": np.asarray(sub_jax.m_posedirs, np.float64),
        "m_weights": np.asarray(sub_jax.m_weights, np.float64),
        "J_template": np.asarray(sub_jax.J_template, np.float64),
        "J_shapedirs": np.asarray(sub_jax.J_shapedirs, np.float64),
        "parents": np.asarray(sub_jax.parents, np.int64),
    }

    # synthetic GT: a mild pose + shape + rigid offset, like a fit target
    rng = np.random.RandomState(3)
    gt_pose = rng.randn(NUM_POSE) * 0.1
    gt_betas = rng.randn(N_BETAS) * 0.5
    gt_orient = np.array([0.1, -0.2, 0.05])
    gt_transl = np.array([0.02, -0.03, 0.1])
    target = np_marker_forward(sub, gt_betas, gt_pose, gt_orient, gt_transl)
    valid = np.ones(86, bool)
    valid[::11] = False  # a few invalid markers, like real confidence gating
    mask = valid.astype(np.float64)[:, None]

    def residual(x, n_free):
        pose = x[:NUM_POSE]
        betas = np.zeros(N_BETAS)
        betas[:n_free] = x[NUM_POSE:NUM_POSE + n_free]
        orient = x[NUM_POSE + n_free:NUM_POSE + n_free + 3]
        transl = x[NUM_POSE + n_free + 3:]
        fwd = np_marker_forward(sub, betas, pose, orient, transl)
        return ((target - fwd) * mask).reshape(-1)

    # stage 0: pose + 2 betas (reference fit_SMPL.py:161-205)
    x0 = np.zeros(NUM_POSE + 2 + 6)
    x_s0, norms0 = lm_oracle(lambda x: residual(x, 2), x0, 30, 0.5, 0.01)

    # stage 1: warm start, all betas (fit_SMPL.py:210-255)
    x1 = np.concatenate([
        x_s0[:NUM_POSE + 2], np.zeros(N_BETAS - 2), x_s0[NUM_POSE + 2:]
    ])
    x_s1, norms1 = lm_oracle(lambda x: residual(x, N_BETAS), x1, 50, 0.2, 1e-3)

    out = os.path.join(os.path.dirname(__file__), "lm_trace.npz")
    np.savez(
        out,
        target=target, valid=valid,
        norms_stage0=norms0, norms_stage1=norms1,
        x_final_stage0=x_s0, x_final_stage1=x_s1,
        gt_pose=gt_pose, gt_betas=gt_betas,
        gt_orient=gt_orient, gt_transl=gt_transl,
    )
    print(f"wrote {out}")
    print("stage0 norms:", norms0[:3], "...", norms0[-2:])
    print("stage1 norms:", norms1[:3], "...", norms1[-2:])
    # final fit should have recovered the GT well
    print("final residual:", norms1[-1])


if __name__ == "__main__":
    main()
