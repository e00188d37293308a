"""Tests for the CPU-side data layer: mesh IO, sampling, geodesics,
proximity, ray casting — all the pieces that replace trimesh/potpourri3d."""

import os

import numpy as np
import pytest

from etch_tpu.data.mesh import TriMesh, load_obj, save_obj, load_ply, save_ply
from etch_tpu.data.sampling import sample_surface
from etch_tpu.data.geodesics import HeatMethodSolver
from etch_tpu.data.proximity import MeshProximity, MeshRayCaster


def _icosphere(subdiv=3):
    from etch_tpu.geometry.icosahedral import _icosahedron_vertices, _faces_from_hull

    v = _icosahedron_vertices()
    f = _faces_from_hull(v)
    mesh = TriMesh(v.copy(), f.copy())
    for _ in range(subdiv):
        mesh = mesh.subdivide()
        mesh.vertices /= np.linalg.norm(mesh.vertices, axis=1, keepdims=True)
    return mesh


def test_obj_roundtrip(tmp_path):
    mesh = _icosphere(1)
    p = str(tmp_path / "m.obj")
    save_obj(p, mesh)
    loaded = load_obj(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)


def test_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(50, 3)
    p = str(tmp_path / "p.ply")
    save_ply(p, pts)
    loaded = load_ply(p)
    np.testing.assert_allclose(loaded, pts, atol=1e-5)


def test_load_reference_binary_ply():
    path = os.path.join(os.path.dirname(__file__), "..", "datafolder",
        "gt_4D-Dress_data", "ply", "00122_Inner_Take2_00011.ply")
    if not os.path.exists(path):
        pytest.skip("sample not mounted")
    pts = load_ply(path)
    assert pts.shape[1] == 3 and len(pts) > 100
    assert np.isfinite(pts).all()


def test_subdivide_preserves_vertex_prefix():
    mesh = _icosphere(0)
    sub = mesh.subdivide()
    np.testing.assert_allclose(sub.vertices[: len(mesh.vertices)], mesh.vertices)
    assert len(sub.faces) == 4 * len(mesh.faces)


def test_sample_surface_on_mesh():
    mesh = _icosphere(2)
    pts, fidx = sample_surface(mesh, 500, seed=0)
    assert pts.shape == (500, 3)
    r = np.linalg.norm(pts, axis=1)
    assert (r < 1.01).all() and (r > 0.9).all()  # on the sphere's surface
    # seeded determinism
    pts2, _ = sample_surface(mesh, 500, seed=0)
    np.testing.assert_array_equal(pts, pts2)


def test_heat_geodesics_on_sphere():
    """Geodesic distance on the unit sphere == great-circle angle."""
    mesh = _icosphere(3)
    solver = HeatMethodSolver(mesh.vertices, mesh.faces)
    src = 0
    d = solver.compute_distance(src)
    expected = np.arccos(np.clip(mesh.vertices @ mesh.vertices[src], -1, 1))
    # heat method is approximate; 5% of pi is a standard tolerance here
    err = np.abs(d - expected)
    assert np.median(err) < 0.05
    assert err.max() < 0.25


def test_closest_point_matches_bruteforce():
    mesh = _icosphere(1)
    prox = MeshProximity(mesh, n_candidates=16)
    rng = np.random.RandomState(0)
    q = rng.randn(40, 3) * 1.5
    cp, dist, fidx = prox.closest_point(q)

    # brute force over all faces
    from etch_tpu.data.proximity import _closest_point_on_triangles

    tri_all = mesh.vertices[mesh.faces][None].repeat(len(q), axis=0)
    cp_all = _closest_point_on_triangles(q, tri_all)
    d_all = np.linalg.norm(cp_all - q[:, None], axis=-1).min(axis=1)
    np.testing.assert_allclose(dist, d_all, atol=1e-9)


def test_closest_point_on_sphere_direction():
    mesh = _icosphere(3)
    prox = MeshProximity(mesh)
    q = np.array([[2.0, 0.0, 0.0], [0.0, -3.0, 0.0]])
    cp, dist, _ = prox.closest_point(q)
    np.testing.assert_allclose(
        cp / np.linalg.norm(cp, axis=1, keepdims=True),
        q / np.linalg.norm(q, axis=1, keepdims=True),
        atol=0.05,
    )
    np.testing.assert_allclose(dist, [1.0, 2.0], atol=0.05)


def test_ray_cast_sphere():
    mesh = _icosphere(3)
    caster = MeshRayCaster(mesh, max_dist=5.0)
    origins = np.array([[3.0, 0.0, 0.0], [0.0, 0.0, 4.0], [3.0, 3.0, 3.0]])
    dirs = -origins / np.linalg.norm(origins, axis=1, keepdims=True)
    t, face, hit = caster.cast(origins, dirs)
    assert hit.all()
    np.testing.assert_allclose(t, [2.0, 3.0, np.sqrt(27) - 1], atol=0.02)
    # miss case
    t2, _, hit2 = caster.cast(
        np.array([[3.0, 0, 0]]), np.array([[0.0, 0, 1]])
    )
    assert not hit2[0]


def test_load_bundled_scan_obj():
    path = os.path.join(
        os.path.dirname(__file__), "..", "datafolder", "4D-DRESS",
        "data_processed", "model", "00122_Inner_Take2_00011",
        "00122_Inner_Take2_00011.obj",
    )
    if not os.path.exists(path):
        pytest.skip("sample not mounted")
    mesh = load_obj(path)
    assert len(mesh.vertices) > 1000 and len(mesh.faces) > 1000
    vmin, vmax = mesh.bounds()
    assert (vmax - vmin).max() < 3.0  # human scale
