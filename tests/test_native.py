"""Tests for the native C++ BVH backend against the numpy reference path."""

import numpy as np
import pytest

from etch_tpu import native
from etch_tpu.data.mesh import TriMesh
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


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_builds():
    assert native.available()


@needs_native
def test_native_closest_point_matches_numpy():
    mesh = _icosphere(2)
    rng = np.random.RandomState(0)
    q = rng.randn(100, 3) * 1.5
    npx = MeshProximity(mesh, use_native=False)
    nat = MeshProximity(mesh, use_native=True)
    assert nat._bvh is not None
    cp_n, d_n, _ = npx.closest_point(q)
    cp_c, d_c, _ = nat.closest_point(q)
    np.testing.assert_allclose(d_c, d_n, atol=1e-10)
    np.testing.assert_allclose(cp_c, cp_n, atol=1e-8)


@needs_native
def test_native_raycast_matches_numpy():
    mesh = _icosphere(3)
    rng = np.random.RandomState(1)
    origins = rng.randn(50, 3)
    origins = 3.0 * origins / np.linalg.norm(origins, axis=1, keepdims=True)
    dirs = -origins / np.linalg.norm(origins, axis=1, keepdims=True)
    npx = MeshRayCaster(mesh, max_dist=5.0, use_native=False)
    nat = MeshRayCaster(mesh, max_dist=5.0, use_native=True)
    assert nat._bvh is not None
    t_n, _, h_n = npx.cast(origins, dirs)
    t_c, _, h_c = nat.cast(origins, dirs)
    np.testing.assert_array_equal(h_c, h_n)
    np.testing.assert_allclose(t_c[h_c], t_n[h_n], atol=1e-9)


@needs_native
def test_native_ray_miss():
    mesh = _icosphere(2)
    nat = MeshRayCaster(mesh, max_dist=10.0)
    t, f, hit = nat.cast(np.array([[3.0, 0, 0]]), np.array([[0.0, 0, 1]]))
    assert not hit[0] and f[0] == -1


@needs_native
def test_native_scales():
    """BVH handles a real scan-sized mesh quickly."""
    import time

    mesh = _icosphere(5)  # 20480 faces... subdiv 5 -> 20*4^5 = 20480
    rng = np.random.RandomState(2)
    q = rng.randn(5000, 3)
    nat = MeshProximity(mesh)
    t0 = time.perf_counter()
    nat.closest_point(q)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native closest_point too slow: {dt}s"
