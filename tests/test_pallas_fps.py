"""Pallas FPS kernel vs XLA reference (interpret mode on CPU; the same
comparison runs compiled on real TPU via bench tooling)."""

import numpy as np
import jax.numpy as jnp
import pytest

from etch_tpu.ops.fps import _fps_xla
from etch_tpu.ops.pallas_fps import fps_pallas


@pytest.mark.slow
def test_pallas_fps_matches_xla_interpret():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 144, 3).astype(np.float32))
    a = np.asarray(fps_pallas(xyz, 16, interpret=True))
    b = np.asarray(_fps_xla(xyz, 16))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_pallas_fps_batch_padding():
    """Batch sizes that don't fill the 8 sublanes still work."""
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(3, 130, 3).astype(np.float32))
    a = np.asarray(fps_pallas(xyz, 10, interpret=True))
    b = np.asarray(_fps_xla(xyz, 10))
    np.testing.assert_array_equal(a, b)
