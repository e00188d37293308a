"""Model-level tests for EtchNet: output contracts and the direction head's
rotation equivariance (the property the SE(3)-equivariant design exists for;
magnitude/confidence heads intentionally see absolute coordinates, as in the
reference, and are not equivariant)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etch_tpu.geometry import anchor_permutation, get_anchors
from etch_tpu.models.etch_net import EtchNet
from etch_tpu.utils.config import EtchConfig

TINY_N = 128


@pytest.fixture(scope="module")
def model_setup():
    cfg = EtchConfig(num_point=TINY_N)
    model = EtchNet(cfg=cfg)
    rng = np.random.RandomState(0)
    v = rng.randn(1, TINY_N, 3).astype(np.float32)
    xyz = 0.2 * v / np.linalg.norm(v, axis=-1, keepdims=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz), train=False)
    apply = jax.jit(
        lambda vs, x: model.apply(vs, x, train=False,
                                  pred_items=("direction", "magnitude"))
    )
    return model, variables, xyz, apply


def test_direction_is_unit(model_setup):
    model, variables, xyz, apply = model_setup
    out = apply(variables, jnp.asarray(xyz))
    d = np.asarray(out["direction"])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_direction_equivariance(model_setup):
    """Rotating the input by a group element rotates predicted directions."""
    model, variables, xyz, apply = model_setup
    g = get_anchors()[23]
    out1 = apply(variables, jnp.asarray(xyz))
    out2 = apply(variables, jnp.asarray(xyz @ g.T))
    d1 = np.asarray(out1["direction"])
    d2 = np.asarray(out2["direction"])
    # d2 == g d1 up to fp accumulation through the attention stack
    err = np.abs(d2 - d1 @ g.T)
    assert np.median(err) < 5e-3, f"median equivariance err {np.median(err)}"
    assert np.mean(err) < 2e-2


def test_magnitude_positive_shape(model_setup):
    model, variables, xyz, apply = model_setup
    out = apply(variables, jnp.asarray(xyz))
    assert out["magnitude"].shape == (1, TINY_N, 1)
    assert np.isfinite(np.asarray(out["magnitude"])).all()
