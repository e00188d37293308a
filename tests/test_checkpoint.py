"""Checkpoint save/restore roundtrip (the reference never implemented resume;
we must prove ours actually restores params + optimizer state + step)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from etch_tpu.train.checkpoint import (
    restore_params,
    restore_train_state,
    save_params,
    save_train_state,
)
from etch_tpu.train.state import TrainState, create_train_state
from etch_tpu.utils.config import EtchConfig


@pytest.fixture(scope="module")
def small_state():
    # tiny config: checkpoint logic is width-independent and production
    # widths pay a pointless multi-minute init on the 1-core CI host
    cfg = EtchConfig.tiny(num_point=128, batch_size=1)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 128, 3), jnp.float32)
    model, state, tx = create_train_state(cfg, rng, example)
    return model, state, tx


def _tree_equal(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for x, y in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_state_roundtrip(tmp_path, small_state):
    model, state, tx = small_state
    save_train_state(str(tmp_path / "ckpt"), 3, state)
    restored, step = restore_train_state(str(tmp_path / "ckpt"), state)
    assert step == 3
    _tree_equal(restored.params, state.params)
    _tree_equal(restored.opt_state, state.opt_state)


def test_params_roundtrip(tmp_path, small_state):
    model, state, tx = small_state
    save_params(str(tmp_path / "w"), state.params, state.batch_stats)
    params, stats = restore_params(str(tmp_path / "w"))
    _tree_equal(params, state.params)


def test_restore_missing_raises(tmp_path, small_state):
    model, state, tx = small_state
    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path / "nope"), state)


def test_restore_tree_mismatch_raises(tmp_path, small_state):
    """A checkpoint written under a different model tree must fail restore
    loudly (tree-version guard), not load partially/silently."""
    model, state, tx = small_state
    save_train_state(str(tmp_path / "ckpt"), 1, state, config_json="{}")

    cfg2 = EtchConfig.tiny(
        num_point=128, batch_size=1, dir_value_dim=8, dir_num_heads=1
    )
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 128, 3), jnp.float32)
    _, other_state, _ = create_train_state(cfg2, rng, example)
    with pytest.raises(ValueError, match="tree signature mismatch"):
        restore_train_state(str(tmp_path / "ckpt"), other_state)
