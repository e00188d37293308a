"""Scan animation: robust skin-weight transfer + LBS unpose/repose.

Rebuild of reference `src/animate.py` (which depends on vendored smplx, igl
and RobustSkinWeightsTransferCode — none available here):

  - clean_mesh: drop degenerate/zero-area/duplicate faces, unused verts (:66-96)
  - weights_transfer: closest-surface match from SMPL to scan with distance
    (5% bbox diag) and normal (30 deg) thresholds, then harmonic inpainting of
    unmatched vertices (:99-122); all-zero weight rows get a root fallback
    (:166-170)
  - repose: T_raw = W @ A_raw per vertex; rest = T_raw^-1 x; new = T_new rest;
    singular-matrix identity guard (:176-204)
  - filter_mesh: drop faces whose edge/area ratios blow up (:16-63)

The weight transfer/inpainting is CPU sparse algebra (scipy); the reposing is
JAX (batched 4x4 solves on device).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from etch_tpu.body.smpl import SMPLModel, _rigid_transforms
from etch_tpu.data.mesh import TriMesh
from etch_tpu.data.proximity import MeshProximity
from etch_tpu.geometry.so3 import rodrigues


def clean_mesh(mesh: TriMesh, area_eps: float = 1e-12) -> TriMesh:
    V, F = mesh.vertices, mesh.faces
    degen = (F[:, 0] == F[:, 1]) | (F[:, 1] == F[:, 2]) | (F[:, 0] == F[:, 2])
    F1 = F[~degen]
    v0, v1, v2 = V[F1[:, 0]], V[F1[:, 1]], V[F1[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    F2 = F1[area >= area_eps]
    F2s = np.sort(F2, axis=1)
    _, uniq = np.unique(F2s, axis=0, return_index=True)
    F3 = F2[sorted(uniq)]
    used = np.unique(F3)
    remap = -np.ones(len(V), dtype=np.int64)
    remap[used] = np.arange(len(used))
    return TriMesh(V[used], remap[F3])


def _cotan_laplacian(V: np.ndarray, F: np.ndarray) -> sp.csr_matrix:
    vi, vj, vk = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    e_i, e_j, e_k = vk - vj, vi - vk, vj - vi

    def cot(a, b):
        cr = np.linalg.norm(np.cross(a, b), axis=1)
        return np.einsum("ij,ij->i", a, b) / np.clip(cr, 1e-14, None)

    ci, cj, ck = cot(-e_j, e_k), cot(-e_k, e_i), cot(-e_i, e_j)
    n = len(V)
    I = np.concatenate([F[:, 1], F[:, 2], F[:, 2], F[:, 0], F[:, 0], F[:, 1]])
    J = np.concatenate([F[:, 2], F[:, 1], F[:, 0], F[:, 2], F[:, 1], F[:, 0]])
    W = 0.5 * np.concatenate([ci, ci, cj, cj, ck, ck])
    Wm = sp.coo_matrix((W, (I, J)), shape=(n, n)).tocsr()
    return sp.diags(np.asarray(Wm.sum(1)).ravel()) - Wm


def find_matches_closest_surface(
    src_mesh: TriMesh,
    src_normals: np.ndarray,
    dst_mesh: TriMesh,
    dst_normals: np.ndarray,
    weights: np.ndarray,
    dist2_threshold: float,
    angle_threshold_deg: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """For each dst vertex: barycentric-interpolated source weights at the
    closest source-surface point, matched iff within distance and normal-angle
    thresholds (RobustSkinWeightsTransfer semantics)."""
    prox = MeshProximity(src_mesh)
    cp, dist, fidx = prox.closest_point(dst_mesh.vertices)

    tri = src_mesh.vertices[src_mesh.faces[fidx]]            # (Q,3,3)
    # barycentric coords of cp in tri
    v0 = tri[:, 1] - tri[:, 0]
    v1 = tri[:, 2] - tri[:, 0]
    v2 = cp - tri[:, 0]
    d00 = np.einsum("ij,ij->i", v0, v0)
    d01 = np.einsum("ij,ij->i", v0, v1)
    d11 = np.einsum("ij,ij->i", v1, v1)
    d20 = np.einsum("ij,ij->i", v2, v0)
    d21 = np.einsum("ij,ij->i", v2, v1)
    denom = np.clip(d00 * d11 - d01 * d01, 1e-20, None)
    b = (d11 * d20 - d01 * d21) / denom
    c = (d00 * d21 - d01 * d20) / denom
    a = 1.0 - b - c
    bary = np.clip(np.stack([a, b, c], 1), 0, 1)
    bary /= bary.sum(1, keepdims=True)

    w_src = weights[src_mesh.faces[fidx]]                    # (Q,3,K)
    w_interp = np.einsum("qk,qkj->qj", bary, w_src)

    n_src = src_normals[src_mesh.faces[fidx]]
    n_interp = np.einsum("qk,qkj->qj", bary, n_src)
    n_interp /= np.clip(np.linalg.norm(n_interp, axis=1, keepdims=True), 1e-12, None)

    cos = np.einsum("ij,ij->i", n_interp, dst_normals)
    angle_ok = cos >= np.cos(np.deg2rad(angle_threshold_deg))
    matched = (dist * dist <= dist2_threshold) & angle_ok
    return matched, w_interp


def inpaint_weights(
    mesh: TriMesh, weights: np.ndarray, matched: np.ndarray
) -> np.ndarray:
    """Harmonic inpainting: unmatched vertex weights solve L w = 0 with
    matched vertices as Dirichlet boundary."""
    if matched.all():
        return weights
    L = _cotan_laplacian(mesh.vertices, mesh.faces).tocsr()
    free = ~matched
    Lff = L[free][:, free].tocsc()
    Lfm = L[free][:, matched]
    rhs = -Lfm @ weights[matched]
    solve = spla.factorized(Lff + 1e-9 * sp.eye(Lff.shape[0], format="csc"))
    out = weights.copy()
    for k in range(weights.shape[1]):
        out[free, k] = solve(rhs[:, k])
    out = np.clip(out, 0.0, None)
    return out


def weights_transfer(
    smpl_mesh: TriMesh, scan_mesh: TriMesh, lbs_weights: np.ndarray
) -> np.ndarray:
    """SMPL -> scan skin-weight transfer (reference animate.py:99-122 +
    normalization with all-zero fallback :166-170)."""
    vmin, vmax = scan_mesh.bounds()
    diag = float(np.linalg.norm(vmax - vmin))
    dist_thr = 0.05 * diag
    matched, w = find_matches_closest_surface(
        smpl_mesh, smpl_mesh.vertex_normals,
        scan_mesh, scan_mesh.vertex_normals,
        lbs_weights, dist_thr * dist_thr, 30.0,
    )
    w = inpaint_weights(scan_mesh, w, matched)
    sums = w.sum(1, keepdims=True)
    zero = sums[:, 0] < 1e-12
    w[zero, 0] = 1.0
    sums[zero] = 1.0
    return w / sums


def blend_transforms(model: SMPLModel, betas, body_pose, global_orient):
    """Per-joint LBS transforms A (B, 24, 4, 4) for given params."""
    B = betas.shape[0]
    v_shaped = model.v_template[None] + jnp.einsum(
        "vcs,bs->bvc", model.shapedirs, betas
    )
    J = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)
    pose = jnp.concatenate([global_orient, body_pose], axis=1).reshape(B, 24, 3)
    R = rodrigues(pose)
    _, A = _rigid_transforms(R, J, model.parents)
    return A


def repose_vertices(
    verts: jnp.ndarray,      # (V, 3) posed scan vertices (transl removed)
    weights: jnp.ndarray,    # (V, 24)
    A_raw: jnp.ndarray,      # (24, 4, 4) transforms of the raw pose
    A_new: jnp.ndarray,      # (24, 4, 4) transforms of the target pose
) -> jnp.ndarray:
    """Unpose to rest then repose (reference animate.py:176-204), with the
    singular-matrix identity guard."""
    V = verts.shape[0]
    T_raw = jnp.einsum("vk,kij->vij", weights, A_raw)
    det = jnp.linalg.det(T_raw)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=verts.dtype), T_raw.shape)
    T_raw = jnp.where((jnp.abs(det) < 1e-10)[:, None, None], eye, T_raw)

    vh = jnp.concatenate([verts, jnp.ones((V, 1), verts.dtype)], axis=1)
    rest = jnp.linalg.solve(T_raw, vh[..., None])[..., 0]   # T_raw^-1 x
    T_new = jnp.einsum("vk,kij->vij", weights, A_new)
    out = jnp.einsum("vij,vj->vi", T_new, rest)
    return out[:, :3]


def filter_mesh(new_mesh: TriMesh, raw_mesh: TriMesh) -> TriMesh:
    """Drop faces stretched beyond the reference's edge/area ratio bounds
    (animate.py:16-63)."""

    def edge_area(m):
        v, f = m.vertices, m.faces
        e0 = np.linalg.norm(v[f[:, 1]] - v[f[:, 0]], axis=1)
        e1 = np.linalg.norm(v[f[:, 2]] - v[f[:, 1]], axis=1)
        e2 = np.linalg.norm(v[f[:, 0]] - v[f[:, 2]], axis=1)
        s = (e0 + e1 + e2) / 2
        area = np.sqrt(np.clip(s * (s - e0) * (s - e1) * (s - e2), 0, None))
        return np.stack([e0, e1, e2], 1), area

    re_, ra = edge_area(raw_mesh)
    ne, na = edge_area(new_mesh)
    edge_ratio = ne / (re_ + 1e-8)
    area_ratio = na / (ra + 1e-8)
    ok = (
        np.all((edge_ratio > 0.3) & (edge_ratio < 2.0), axis=1)
        & (area_ratio > 0.1)
        & (area_ratio < 4.0)
    )
    F = new_mesh.faces[ok]
    used = np.unique(F)
    remap = -np.ones(len(new_mesh.vertices), np.int64)
    remap[used] = np.arange(len(used))
    return TriMesh(new_mesh.vertices[used], remap[F])


def animate_scan(
    model: SMPLModel,
    scan_mesh: TriMesh,
    raw_params: dict,        # betas (1,10), body_pose (1,69), global_orient (1,3), transl (1,3)
    new_body_pose: jnp.ndarray,  # (1, 69)
) -> TriMesh:
    """Full animation pipeline (reference animate():125-209)."""
    from etch_tpu.body.smpl import smpl_forward

    scan = clean_mesh(scan_mesh)
    transl = np.asarray(raw_params["transl"]).reshape(1, 3)

    verts_raw, _ = smpl_forward(
        model, raw_params["betas"], raw_params["body_pose"],
        raw_params["global_orient"], jnp.zeros((1, 3)),
    )
    smpl_mesh_raw = TriMesh(np.asarray(verts_raw[0], np.float64), model.faces)

    W = weights_transfer(smpl_mesh_raw, scan, np.asarray(model.lbs_weights))

    A_raw = blend_transforms(
        model, raw_params["betas"], raw_params["body_pose"],
        raw_params["global_orient"],
    )[0]
    A_new = blend_transforms(
        model, raw_params["betas"], new_body_pose, raw_params["global_orient"]
    )[0]

    verts_untrans = jnp.asarray(scan.vertices - transl, jnp.float32)
    new_verts = repose_vertices(
        verts_untrans, jnp.asarray(W, jnp.float32), A_raw, A_new
    )
    out = TriMesh(np.asarray(new_verts) + transl, scan.faces)
    return filter_mesh(out, scan)
