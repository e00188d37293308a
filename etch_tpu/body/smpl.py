"""SMPL body model in JAX: blend shapes + pose correctives + LBS.

The reference depends on the pip `smplx` package (torch) for the body model
(`src/models/fit_SMPL.py:2,100-101`); here the model is a pytree of arrays and
a pair of pure functions, so the whole fitting loop jits and vmaps.

Loader notes: SMPL .pkl releases variously contain numpy arrays, chumpy
wrappers, and scipy sparse matrices; `load_smpl` unpickles them without
needing chumpy installed by stubbing chumpy classes and extracting their
underlying ndarrays.

The 45-joint output layout matches smplx's SMPL (24 skeleton joints followed
by 21 surface landmark vertices — the standard smplx vertex_ids table), so
npz outputs stay drop-in compatible with the reference's
(`src/inference_demo.py:121-127`).
"""

from __future__ import annotations

import dataclasses
import functools
import io
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.geometry.so3 import rodrigues

# smplx's standard SMPL surface-landmark vertex ids (public metadata of the
# SMPL topology; order defines joints[24:45]).
SMPL_LANDMARK_VERTEX_IDS = {
    "nose": 332, "reye": 6260, "leye": 2800, "rear": 4071, "lear": 583,
    "LBigToe": 3216, "LSmallToe": 3226, "LHeel": 3387,
    "RBigToe": 6617, "RSmallToe": 6624, "RHeel": 6787,
    "lthumb": 2746, "lindex": 2319, "lmiddle": 2445, "lring": 2556,
    "lpinky": 2673,
    "rthumb": 6191, "rindex": 5782, "rmiddle": 5905, "rring": 6016,
    "rpinky": 6133,
}

NUM_BODY_JOINTS = 23  # SMPL (excl. root)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SMPLModel:
    """Array bundle for one SMPL body model (one gender)."""

    v_template: jnp.ndarray   # (V, 3)
    shapedirs: jnp.ndarray    # (V, 3, n_betas)
    posedirs: jnp.ndarray     # (207, V*3)  pose-corrective basis (row-major)
    J_regressor: jnp.ndarray  # (24, V)
    lbs_weights: jnp.ndarray  # (V, 24)
    parents: jnp.ndarray      # (24,) int32, parents[0] == -1
    faces: np.ndarray         # (F, 3) int32 — static, not traced
    landmark_ids: np.ndarray  # (21,) int32 — static

    def tree_flatten(self):
        leaves = (
            self.v_template, self.shapedirs, self.posedirs,
            self.J_regressor, self.lbs_weights, self.parents,
        )
        aux = (self.faces, self.landmark_ids)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, *aux)

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]


def _to_np(x):
    """ndarray from numpy / chumpy-stub / scipy sparse."""
    if isinstance(x, np.ndarray):
        return x
    if hasattr(x, "toarray"):  # scipy sparse
        return np.asarray(x.toarray())
    if hasattr(x, "r"):        # live chumpy object
        return np.asarray(x.r)
    if isinstance(x, _ChStub):
        return x.array()
    return np.asarray(x)


class _ChStub:
    """Stand-in for chumpy objects during unpickling."""

    def __init__(self, *a, **k):
        self.__dict__["_state"] = {}

    def __setstate__(self, state):
        self.__dict__["_state"] = state

    def array(self):
        st = self.__dict__.get("_state", {})
        if isinstance(st, dict):
            for key in ("x", "a", "v"):
                if key in st:
                    return _to_np(st[key])
        raise ValueError("cannot extract array from chumpy stub")


class _SMPLUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChStub
        return super().find_class(module, name)


def load_smpl(path: str, dtype=np.float32) -> SMPLModel:
    """Load an SMPL pkl (any of the common release formats)."""
    with open(path, "rb") as f:
        data = _SMPLUnpickler(f, encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(dtype)
    shapedirs = _to_np(data["shapedirs"]).astype(dtype)
    if shapedirs.shape[-1] > 10:
        shapedirs = shapedirs[..., :10]
    posedirs = _to_np(data["posedirs"]).astype(dtype)
    # store as (207, V*3) so the pose blend is one matmul
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T.copy()
    J_regressor = _to_np(data["J_regressor"]).astype(dtype)
    weights = _to_np(data["weights"]).astype(dtype)
    kintree = _to_np(data["kintree_table"]).astype(np.int64)
    parents = kintree[0].astype(np.int32)
    parents[0] = -1
    faces = _to_np(data["f"]).astype(np.int32)
    landmark_ids = np.array(list(SMPL_LANDMARK_VERTEX_IDS.values()), np.int32)

    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        parents=jnp.asarray(parents),
        faces=faces,
        landmark_ids=landmark_ids,
    )


def _rigid_transforms(R: jnp.ndarray, J: jnp.ndarray, parents) -> jnp.ndarray:
    """Forward kinematics: per-joint world transforms with rest-pose removal.

    R: (B, 24, 3, 3); J: (B, 24, 3) rest joints.
    Returns A: (B, 24, 4, 4) such that v' = sum_k w_k A_k v_rest (homog).
    """
    parents = np.asarray(parents)
    # relative joint offsets
    J_rel = jnp.concatenate(
        [J[:, :1], J[:, 1:] - J[:, parents[1:]]], axis=1
    )  # (B, 24, 3)

    def make_T(Rk, tk):
        T = jnp.zeros(Rk.shape[:-2] + (4, 4), Rk.dtype)
        T = T.at[..., :3, :3].set(Rk)
        T = T.at[..., :3, 3].set(tk)
        T = T.at[..., 3, 3].set(1.0)
        return T

    T_local = make_T(R, J_rel)  # (B, 24, 4, 4)

    # chain composition (static unrolled loop over 24 joints)
    world = [T_local[:, 0]]
    for k in range(1, T_local.shape[1]):
        world.append(world[parents[k]] @ T_local[:, k])
    W = jnp.stack(world, axis=1)  # (B, 24, 4, 4)

    # subtract rest-pose contribution: A = W - pack(W_rot @ J_rest)
    WJ = jnp.einsum("bkij,bkj->bki", W[..., :3, :3], J)
    A = W.at[..., :3, 3].add(-WJ)
    return W, A


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,         # (B, n_betas)
    body_pose: jnp.ndarray,     # (B, 69) axis-angle
    global_orient: jnp.ndarray, # (B, 3)
    transl: jnp.ndarray,        # (B, 3)
):
    """Full SMPL forward.  Returns (vertices (B,V,3), joints (B,45,3))."""
    B = betas.shape[0]
    V = model.num_verts
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas
    )
    J = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)  # (B, 24, 3)

    pose = jnp.concatenate([global_orient, body_pose], axis=1).reshape(B, 24, 3)
    R = rodrigues(pose)                                          # (B,24,3,3)
    eye = jnp.eye(3, dtype=R.dtype)
    pose_feat = (R[:, 1:] - eye).reshape(B, 23 * 9)              # (B, 207)
    v_posed = v_shaped + jnp.einsum(
        "pd,bp->bd", model.posedirs, pose_feat
    ).reshape(B, V, 3)

    _, A = _rigid_transforms(R, J, model.parents)
    T = jnp.einsum("vk,bkij->bvij", model.lbs_weights, A)        # (B,V,4,4)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, V, 1), v_posed.dtype)], -1)
    verts = jnp.einsum("bvij,bvj->bvi", T, v_h)[..., :3] + transl[:, None]

    joints24 = jnp.einsum("jv,bvc->bjc", model.J_regressor, verts - transl[:, None])
    joints24 = joints24 + transl[:, None]
    landmarks = verts[:, model.landmark_ids]
    joints = jnp.concatenate([joints24, landmarks], axis=1)      # (B, 45, 3)
    return verts, joints


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "m_template", "m_shapedirs", "m_posedirs", "m_weights",
        "J_template", "J_shapedirs",
    ],
    meta_fields=["parents"],
)
@dataclasses.dataclass(frozen=True)
class MarkerSubModel:
    """SMPL restricted to a marker vertex subset — the fitting loop only needs
    the 86 marker vertices, so the per-iteration LBS is (86,.) instead of
    (6890,.).  Joint locations still come from the full-shape regressor, which
    reduces to closed-form (24,3) + (24,3,n_betas) tensors."""

    m_template: jnp.ndarray    # (M, 3)
    m_shapedirs: jnp.ndarray   # (M, 3, n_betas)
    m_posedirs: jnp.ndarray    # (207, M*3)
    m_weights: jnp.ndarray     # (M, 24)
    J_template: jnp.ndarray    # (24, 3)
    J_shapedirs: jnp.ndarray   # (24, 3, n_betas)
    parents: tuple             # static metadata (hashable for jit caching)


def marker_submodel(model: SMPLModel, marker_vids: np.ndarray) -> MarkerSubModel:
    vids = np.asarray(marker_vids, np.int32)
    M = len(vids)
    pose_rows = model.posedirs.reshape(207, model.num_verts, 3)[:, vids, :]
    return MarkerSubModel(
        m_template=model.v_template[vids],
        m_shapedirs=model.shapedirs[vids],
        m_posedirs=pose_rows.reshape(207, M * 3),
        m_weights=model.lbs_weights[vids],
        J_template=jnp.einsum("jv,vc->jc", model.J_regressor, model.v_template),
        J_shapedirs=jnp.einsum("jv,vcs->jcs", model.J_regressor, model.shapedirs),
        parents=tuple(int(p) for p in np.asarray(model.parents)),
    )


def marker_forward(
    sub: MarkerSubModel,
    betas: jnp.ndarray,
    body_pose: jnp.ndarray,
    global_orient: jnp.ndarray,
    transl: jnp.ndarray,
) -> jnp.ndarray:
    """Marker positions only: (B, M, 3)."""
    B = betas.shape[0]
    M = sub.m_template.shape[0]
    m_shaped = sub.m_template[None] + jnp.einsum(
        "mcs,bs->bmc", sub.m_shapedirs, betas
    )
    J = sub.J_template[None] + jnp.einsum("jcs,bs->bjc", sub.J_shapedirs, betas)

    pose = jnp.concatenate([global_orient, body_pose], axis=1).reshape(B, 24, 3)
    R = rodrigues(pose)
    eye = jnp.eye(3, dtype=R.dtype)
    pose_feat = (R[:, 1:] - eye).reshape(B, 207)
    m_posed = m_shaped + jnp.einsum(
        "pd,bp->bd", sub.m_posedirs, pose_feat
    ).reshape(B, M, 3)

    _, A = _rigid_transforms(R, J, sub.parents)
    T = jnp.einsum("mk,bkij->bmij", sub.m_weights, A)
    m_h = jnp.concatenate([m_posed, jnp.ones((B, M, 1), m_posed.dtype)], -1)
    return jnp.einsum("bmij,bmj->bmi", T, m_h)[..., :3] + transl[:, None]


def synthetic_body_model(
    n_verts: int = 300, n_joints: int = 24, n_betas: int = 10, seed: int = 0
) -> SMPLModel:
    """Small deterministic body-like model for tests (no SMPL pkl needed).

    A vertical capsule of vertices, a 24-joint chain along it, distance-based
    smooth skinning weights, small random blend shapes.
    """
    rng = np.random.RandomState(seed)
    z = np.linspace(-0.9, 0.9, n_verts)
    theta = rng.uniform(0, 2 * np.pi, n_verts)
    r = 0.12 + 0.02 * np.cos(3 * z)
    v_template = np.stack([r * np.cos(theta), r * np.sin(theta), z], 1)

    joint_z = np.linspace(-0.85, 0.85, n_joints)
    joints = np.stack([np.zeros(n_joints), np.zeros(n_joints), joint_z], 1)
    parents = np.arange(-1, n_joints - 1, dtype=np.int32)

    d = np.abs(z[:, None] - joint_z[None, :])
    w = np.exp(-(d / 0.15) ** 2) + 1e-6
    weights = w / w.sum(1, keepdims=True)

    # J_regressor reproducing the rest joints from the template via
    # normalized soft assignment
    jr = np.exp(-(d.T / 0.05) ** 2) + 1e-9
    jr = jr / jr.sum(1, keepdims=True)
    # correct it so jr @ v_template == joints exactly in z and 0 in xy:
    # acceptable approximation for tests.

    shapedirs = rng.randn(n_verts, 3, n_betas).astype(np.float64) * 0.01
    posedirs = (rng.randn((n_joints - 1) * 9, n_verts * 3) * 1e-4)

    faces = np.stack(
        [np.arange(n_verts - 2), np.arange(1, n_verts - 1), np.arange(2, n_verts)], 1
    ).astype(np.int32)
    lm = np.linspace(0, n_verts - 1, 21).astype(np.int32)

    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    return SMPLModel(
        v_template=f32(v_template),
        shapedirs=f32(shapedirs),
        posedirs=f32(posedirs),
        J_regressor=f32(jr),
        lbs_weights=f32(weights),
        parents=jnp.asarray(parents),
        faces=faces,
        landmark_ids=lm,
    )
