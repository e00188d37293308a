"""Tests for the auxiliary ops: neighbor subtraction/aggregation (pointops
parity) and point-mesh distance."""

import numpy as np
import jax.numpy as jnp

from etch_tpu.ops.neighbor_ops import neighbor_aggregation, neighbor_subtraction
from etch_tpu.ops.point_mesh import point_mesh_distance


def test_subtraction_semantics():
    rng = np.random.RandomState(0)
    x1 = rng.randn(1, 6, 4).astype(np.float32)
    x2 = rng.randn(1, 6, 4).astype(np.float32)
    idx = rng.randint(0, 6, (1, 6, 3)).astype(np.int32)
    out = np.asarray(neighbor_subtraction(x1, x2, idx))
    for i in range(6):
        for j in range(3):
            np.testing.assert_allclose(out[0, i, j], x1[0, i] - x2[0, idx[0, i, j]])


def test_aggregation_matches_cuda_semantics():
    """Oracle mirrors the CUDA kernel loop
    (aggregation_cuda_kernel.cu:5-20) incl. the c % w_c weight indexing."""
    rng = np.random.RandomState(1)
    N, K, C, Wc = 5, 3, 8, 2
    inputs = rng.randn(1, N, C).astype(np.float32)
    position = rng.randn(1, N, K, C).astype(np.float32)
    weight = rng.randn(1, N, K, Wc).astype(np.float32)
    idx = rng.randint(0, N, (1, N, K)).astype(np.int32)
    out = np.asarray(neighbor_aggregation(inputs, position, weight, idx))

    ref = np.zeros((N, C), np.float32)
    for i in range(N):
        for c in range(C):
            for j in range(K):
                ref[i, c] += (
                    inputs[0, idx[0, i, j], c] + position[0, i, j, c]
                ) * weight[0, i, j, c % Wc]
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_point_mesh_distance_simple():
    # unit right triangle in z=0 plane
    verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    pts = np.array([[[0.25, 0.25, 0.5], [2.0, 0.0, 0.0], [-1.0, -1.0, 0.0]]], np.float32)
    d = np.asarray(point_mesh_distance(pts, verts, jnp.asarray(faces), k=1))
    np.testing.assert_allclose(d[0], [0.5, 1.0, np.sqrt(2)], atol=1e-5)


def test_point_mesh_distance_zero_on_surface():
    rng = np.random.RandomState(2)
    verts = rng.randn(1, 10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    # barycentric points on each face
    tri = verts[0][faces]
    bary = rng.dirichlet([1, 1, 1], size=3).astype(np.float32)
    pts = np.einsum("fk,fkc->fc", bary, tri)[None]
    d = np.asarray(point_mesh_distance(pts, verts, jnp.asarray(faces), k=3))
    np.testing.assert_allclose(d[0], 0.0, atol=1e-5)


def test_group_points_transposed_matches_group_points():
    import jax.numpy as jnp
    import numpy as np

    from etch_tpu.ops import group_points, group_points_transposed

    rng = np.random.RandomState(0)
    B, N, C, M, K = 3, 50, 8, 20, 5
    feats = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B, M, K)), jnp.int32)
    a = group_points(feats, idx)                     # (B, M, K, C)
    b = group_points_transposed(feats, idx)          # (K, B*M, C)
    np.testing.assert_array_equal(
        np.asarray(b), np.asarray(a).reshape(B * M, K, C).transpose(1, 0, 2))
