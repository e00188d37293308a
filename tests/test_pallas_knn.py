"""Pallas sort-free kNN / ball-query kernels vs the XLA reference paths
(interpret mode on CPU; the same comparison runs compiled on real TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from etch_tpu.ops.knn import _knn_xla
from etch_tpu.ops.ball_query import _ball_query_xla
from etch_tpu.ops.pallas_knn import ball_query_pallas, knn_pallas


def _clouds(seed, b, m, n, dup=True):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, m, 3).astype(np.float32) * 0.3
    s = rng.randn(b, n, 3).astype(np.float32) * 0.3
    if dup:
        # exact duplicates + query coinciding with a support point: exercises
        # the smaller-index tie-break and dist==0
        s[:, 20] = s[:, 5]
        q[:, 3] = s[:, 17]
    return jnp.asarray(q), jnp.asarray(s)


@pytest.mark.slow
@pytest.mark.parametrize("k", [3, 8])
def test_pallas_knn_matches_xla_interpret(k):
    q, s = _clouds(0, 2, 40, 160)
    i1, d1 = _knn_xla(q, s, k)
    i2, d2 = knn_pallas(q, s, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.sqrt(np.maximum(np.asarray(d2), 0.0)),
        atol=1e-6, rtol=1e-5,
    )


@pytest.mark.slow
@pytest.mark.parametrize("radius,ns", [(0.2, 8), (0.45, 16), (0.05, 8)])
def test_pallas_ball_query_matches_xla_interpret(radius, ns):
    # 0.05 radius leaves some balls empty -> index-0 semantics; 0.45 makes
    # most balls overfull -> first-ns-in-index-order; middle -> repeat-fill
    q, s = _clouds(1, 2, 40, 160)
    b1 = _ball_query_xla(q, s, radius, ns)
    b2 = ball_query_pallas(q, s, radius, ns, interpret=True)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


@pytest.mark.slow
def test_pallas_knn_query_not_multiple_of_tile():
    q, s = _clouds(2, 3, 37, 150, dup=False)
    i1, _ = _knn_xla(q, s, 5)
    i2, _ = knn_pallas(q, s, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
