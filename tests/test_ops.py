"""Golden tests for point-cloud primitives against numpy reference semantics.

The numpy oracles reproduce the documented behavior of the reference CUDA
kernels (see etch_tpu/ops/*.py docstrings for the file:line citations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etch_tpu.ops import ball_query, fps, gather_points, group_points, knn, knn_interpolate


def _np_knn(query, support, k):
    d = ((query[:, None] - support[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.sqrt(np.take_along_axis(d, idx, axis=1))


def _np_fps(pts, m):
    N = pts.shape[0]
    idx = np.zeros(m, dtype=np.int64)
    mind = np.full(N, np.inf)
    for i in range(1, m):
        d = ((pts - pts[idx[i - 1]]) ** 2).sum(-1)
        mind = np.minimum(mind, d)
        idx[i] = np.argmax(mind)
    return idx


def _np_ball_query(query, support, radius, nsample):
    out = np.zeros((len(query), nsample), dtype=np.int64)
    for qi, q in enumerate(query):
        d2 = ((support - q) ** 2).sum(-1)
        hits = np.where(d2 < radius**2)[0][:nsample]
        cnt = len(hits)
        if cnt == 0:
            continue
        for j in range(nsample):
            out[qi, j] = hits[j] if j < cnt else hits[j % cnt]
    return out


@pytest.fixture
def clouds():
    rng = np.random.RandomState(0)
    return (
        rng.randn(2, 64, 3).astype(np.float32),
        rng.randn(2, 100, 3).astype(np.float32),
    )


def test_knn_matches_bruteforce(clouds):
    q, s = clouds
    idx, dist = knn(q, s, 5)
    for b in range(2):
        ridx, rdist = _np_knn(q[b], s[b], 5)
        np.testing.assert_array_equal(np.asarray(idx)[b], ridx)
        np.testing.assert_allclose(np.asarray(dist)[b], rdist, atol=1e-4)


def test_knn_chunking_is_transparent(clouds):
    q, s = clouds
    a, _ = knn(q, s, 4, chunk=16)
    b, _ = knn(q, s, 4, chunk=1024)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fps_matches_reference(clouds):
    _, s = clouds
    idx = fps(s, 10)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(idx)[b], _np_fps(s[b], 10))


def test_fps_lazy_returns_arange(clouds):
    _, s = clouds
    idx = fps(s, 10, lazy=True)
    np.testing.assert_array_equal(np.asarray(idx), np.tile(np.arange(10), (2, 1)))


def test_fps_coverage_property(clouds):
    """FPS covers the cloud: max min-distance shrinks monotonically."""
    _, s = clouds
    idx = np.asarray(fps(s, 32))[0]
    assert len(set(idx.tolist())) == 32  # no duplicate centers


def test_ball_query_semantics(clouds):
    q, s = clouds
    radius, nsample = 1.2, 8
    idx = np.asarray(ball_query(q, s, radius, nsample))
    for b in range(2):
        np.testing.assert_array_equal(idx[b], _np_ball_query(q[b], s[b], radius, nsample))


def test_ball_query_empty_ball():
    q = np.array([[[100.0, 100, 100]]], dtype=np.float32)
    s = np.zeros((1, 10, 3), dtype=np.float32)
    idx = np.asarray(ball_query(q, s, 0.5, 4))
    np.testing.assert_array_equal(idx, np.zeros((1, 1, 4), dtype=np.int64))


def test_gather_group():
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 5)).astype(np.int32)
    out = np.asarray(gather_points(feats, idx))
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b][idx[b]])
    gidx = rng.randint(0, 10, size=(2, 5, 3)).astype(np.int32)
    gout = np.asarray(group_points(feats, gidx))
    for b in range(2):
        np.testing.assert_allclose(gout[b], feats[b][gidx[b]])


def test_interpolation_exact_at_source_points():
    """Interpolating back onto the source points reproduces the features."""
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 20, 3).astype(np.float32)
    feat = rng.randn(1, 20, 6).astype(np.float32)
    out = np.asarray(knn_interpolate(xyz, xyz, feat, k=3))
    np.testing.assert_allclose(out[0], feat[0], atol=1e-3)


def test_interpolation_weights():
    src = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], dtype=np.float32)
    dst = np.array([[[0.5, 0, 0]]], dtype=np.float32)
    feat = np.array([[[1.0], [2.0], [3.0], [100.0]]], dtype=np.float32)
    out = np.asarray(knn_interpolate(src, dst, feat, k=2))
    np.testing.assert_allclose(out[0, 0, 0], 1.5, atol=1e-4)


def test_gather_points_grad_matches_scatter():
    """The one-hot-matmul backward == the default scatter-add transpose."""
    rng = np.random.RandomState(7)
    B, N, M, D = 2, 32, 48, 6
    feats = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, M)).astype(np.int32))

    def loss_ours(f):
        return jnp.sum(gather_points(f, idx) ** 2)

    def loss_ref(f):
        # plain indexing (default scatter-add VJP)
        return jnp.sum(jax.vmap(lambda a, b: a[b])(f, idx) ** 2)

    g1 = jax.grad(loss_ours)(feats)
    g2 = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)

    # 3D trailing dims
    feats3 = jnp.asarray(rng.randn(B, N, 3, 4).astype(np.float32))
    g3 = jax.grad(lambda f: jnp.sum(gather_points(f, idx) ** 2))(feats3)
    g4 = jax.grad(lambda f: jnp.sum(
        jax.vmap(lambda a, b: a[b])(f, idx) ** 2))(feats3)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                               rtol=1e-5, atol=1e-6)
