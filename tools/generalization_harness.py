"""Held-out generalization harness (VERDICT round-3 next #3).

The overfit artifacts show the production model can MEMORIZE (8 synthetic
scans, or the one bundled real scan).  This harness shows it LEARNS: a
parametric family of synthetic bodies — per-seed pose (smoothly bent +
twisted spine) and shape (radius-profile harmonics) — is pushed through the
REAL GT pipeline (native-BVH infopoint raycast `cli/generate_infopoints.py`,
surface sampling + 1 cm info-vector rule + heat-method geodesic
labels/confidences `data/dataset.py::load_item` — the same code path the
real 4D-Dress sample takes), the production model trains on K_TRAIN bodies
and is evaluated on bodies it has NEVER seen.

Protocol anchor: the reference's quality claim is a held-out-split eval
(`/root/reference/src/eval.py:234-265`, train 94,501 samples / eval val
split).  Without the licensed datasets the split is over the synthetic
family instead; everything downstream of the meshes is the production
pipeline.

Family construction (all meshes are closed tubes with pole caps, valid for
ray casting and heat geodesics):
  * spine: z in [-0.9, 0.9] bent by per-seed quadratic/cubic xy offsets and
    twisted by a linear-in-z angle — the "pose";
  * body radius: r(z, theta) = 0.14 + per-seed low-order harmonics — the
    "shape";
  * scan (clothing): body + a strictly positive smooth bump field along the
    outward normal (per-seed amplitudes), so the tightness GT is nontrivial;
  * markers: 86 FIXED (z, theta) grid vertex ids shared across the family
    (body-semantic, like the reference's SMPL-vertex markerset).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etch_tpu.data.mesh import TriMesh, save_obj  # noqa: E402

N_THETA = 48
N_Z = 96
N_MARKERS = 86


def _tube_mesh(radii: np.ndarray, spine: np.ndarray, twist: np.ndarray,
               z: np.ndarray) -> TriMesh:
    """Closed tube: (N_Z, N_THETA) radius grid around a bent spine.

    radii: (N_Z, N_THETA); spine: (N_Z, 3); twist: (N_Z,) angle offset.
    """
    nz, nt = radii.shape
    th = np.linspace(0, 2 * np.pi, nt, endpoint=False)[None, :] + twist[:, None]
    # local frame: keep ring planes horizontal (xy) — deformations are mild
    x = spine[:, 0:1] + radii * np.cos(th)
    y = spine[:, 1:2] + radii * np.sin(th)
    zz = np.broadcast_to(spine[:, 2:3], radii.shape)
    verts = np.stack([x, y, zz], axis=-1).reshape(-1, 3)

    faces = []
    for i in range(nz - 1):
        for j in range(nt):
            a = i * nt + j
            b = i * nt + (j + 1) % nt
            c = (i + 1) * nt + j
            d = (i + 1) * nt + (j + 1) % nt
            faces.append([a, b, d])
            faces.append([a, d, c])
    # pole caps (fan to centroid of the end rings)
    bot = len(verts)
    verts = np.concatenate(
        [verts, spine[0:1] - [0, 0, 0.02], spine[-1:] + [0, 0, 0.02]], axis=0
    )
    top = bot + 1
    for j in range(nt):
        faces.append([bot, (j + 1) % nt, j])
        base = (nz - 1) * nt
        faces.append([top, base + j, base + (j + 1) % nt])
    return TriMesh(np.asarray(verts, np.float64),
                   np.asarray(faces, np.int32))


def make_pair(seed: int):
    """(body TriMesh, scan TriMesh) for one family member."""
    rng = np.random.RandomState(seed)
    z = np.linspace(-0.9, 0.9, N_Z)

    # pose: bent + twisted spine
    bend = rng.uniform(-0.25, 0.25, 4)
    spine = np.stack([
        bend[0] * z ** 2 + bend[1] * z ** 3,
        bend[2] * z ** 2 + bend[3] * z ** 3,
        z,
    ], axis=1)
    twist = rng.uniform(-0.8, 0.8) * z

    # shape: radius-profile harmonics (z and theta)
    th = np.linspace(0, 2 * np.pi, N_THETA, endpoint=False)
    amp = rng.uniform(-0.02, 0.02, 3)
    r = (0.14
         + amp[0] * np.cos(2.5 * z)[:, None]
         + amp[1] * np.sin(1.5 * z)[:, None]
         + amp[2] * np.cos(2 * th)[None, :] * (1 - z ** 2)[:, None])
    r = np.maximum(r, 0.06)

    # clothing: strictly positive smooth bump field
    ba = rng.uniform(0.008, 0.02, 3)
    ph = rng.uniform(0, 2 * np.pi, 3)
    bump = (0.008
            + ba[0] * (1 + np.sin(3 * z[:, None] + ph[0])) / 2
            + ba[1] * (1 + np.cos(2 * th[None, :] + ph[1])) / 2
            + ba[2] * (1 + np.sin(4 * z[:, None] + 3 * th[None, :] + ph[2])) / 2)

    body = _tube_mesh(r, spine, twist, z)
    scan = _tube_mesh(r + bump, spine, twist, z)
    return body, scan


def marker_vertex_ids() -> list:
    """86 fixed (z, theta) grid ids, shared across the family."""
    ids = []
    # 2 pole-adjacent rings excluded; spread markers over the grid interior
    zi = np.linspace(4, N_Z - 5, 22).astype(int)
    k = 0
    for i, zz in enumerate(zi):
        for tj in range(4):
            if k >= N_MARKERS:
                break
            ids.append(int(zz * N_THETA + (tj * N_THETA // 4
                                           + (i * 7) % N_THETA) % N_THETA))
            k += 1
    return ids[:N_MARKERS]


def build_item_files(workdir: str, seed: int) -> str:
    """Write scan/body/infopoints in the DatasetPaths layout; returns id."""
    from etch_tpu.cli.generate_infopoints import generate_for_pair

    id_ = f"synth_{seed:04d}"
    body, scan = make_pair(seed)
    scan_dir = os.path.join(workdir, "model", id_)
    smpl_dir = os.path.join(workdir, "smplh", id_)
    info_dir = os.path.join(workdir, "npz")
    for d in (scan_dir, smpl_dir, info_dir):
        os.makedirs(d, exist_ok=True)
    save_obj(os.path.join(scan_dir, f"{id_}.obj"), scan)
    save_obj(os.path.join(smpl_dir, f"mesh_smpl_{id_}.obj"), body)
    # gender metadata npz (load_item reads it; 0 = neutral)
    np.savez(os.path.join(smpl_dir, f"info_{id_}.npz"), gender=0)
    pts, vecs = generate_for_pair(body, scan, n_samples=30000, seed=seed)
    np.savez(os.path.join(info_dir, f"{id_}.npz"),
             info_points=pts, info_vectors=vecs)
    return id_


def build_items(workdir: str, seeds, num_point: int, samplings=1,
                verbose=True):
    """Full real-pipeline items for each family seed.

    Returns (batch dict stacked over items, gt_markers (n_items, 86, 3))."""
    from etch_tpu.data.dataset import DatasetPaths, load_item

    paths = DatasetPaths(
        scan_dir=os.path.join(workdir, "model"),
        smpl_dir=os.path.join(workdir, "smplh"),
        infopoints_dir=os.path.join(workdir, "npz"),
    )
    vids = marker_vertex_ids()
    items, gt_mk = [], []
    for seed in seeds:
        import time as _t
        t0 = _t.time()
        id_ = build_item_files(workdir, seed)
        body, _ = make_pair(seed)
        for s in range(samplings):
            items.append(load_item(paths, id_, num_point, vids,
                                   seed=seed * 100 + s))
            gt_mk.append(body.vertices[vids])
        if verbose:
            print(f"  seed {seed}: {samplings} item(s) in "
                  f"{_t.time() - t0:.1f}s", flush=True)
    batch = {
        k: np.stack([it[k] for it in items])
        for k in ("hitpts", "vectors", "confidences", "labels")
    }
    return batch, np.stack(gt_mk)
