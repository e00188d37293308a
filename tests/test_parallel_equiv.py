"""8-device vs 1-device numerical equivalence of the train step.

The parity statement for the reference's DataParallel training
(`/root/reference/src/train.py:212-214`) is not "the sharded step runs" but
"the sharded step computes the same update": after k steps on identical data,
params from an 8-device data-parallel mesh must equal params from a single
device.  Under GSPMD the sharded program is semantically identical — only
collective insertion and reduction order differ — so any disagreement beyond
float reassociation noise is a sharding bug.

Covers both the f32 default and the use_bfloat16 compute policy (the bf16 leg
is exactly what the driver dryrun does NOT exercise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etch_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from etch_tpu.train.state import create_train_state, make_train_step
from etch_tpu.utils.config import EtchConfig

K_STEPS = 3
N_DEV = 8


def _make_batch(cfg, rs, batch_size):
    v = rs.randn(batch_size, cfg.num_point, 3).astype(np.float32)
    pts = 0.2 * v / np.linalg.norm(v, axis=-1, keepdims=True)
    return {
        "hitpts": pts,
        "vectors": rs.randn(batch_size, cfg.num_point, 3).astype(np.float32) * 0.01,
        "confidences": rs.rand(batch_size, cfg.num_point, 1).astype(np.float32),
        "labels": rs.randint(0, 86, (batch_size, cfg.num_point)).astype(np.int32),
    }


def _run(cfg, batches, sharded):
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, cfg.num_point, 3), jnp.float32)
    model, state, tx = create_train_state(cfg, rng, example)
    train_step = make_train_step(model, tx, cfg)
    if sharded:
        devices = jax.devices()[:N_DEV]
        assert len(devices) == N_DEV, "conftest must provide an 8-device mesh"
        mesh = make_mesh(devices)
        state = replicate(mesh, state)
        batches = [shard_batch(mesh, b) for b in batches]
    losses = None
    for b in batches:
        state, losses = train_step(state, b)
    return jax.device_get(state.params), jax.device_get(losses)


@pytest.mark.parametrize("use_bf16", [False, True], ids=["f32", "bf16"])
def test_sharded_step_matches_single_device(use_bf16):
    cfg = EtchConfig(num_point=512, batch_size=N_DEV, use_bfloat16=use_bf16)
    rs = np.random.RandomState(0)
    batches = [_make_batch(cfg, rs, N_DEV) for _ in range(K_STEPS)]

    params_1, losses_1 = _run(cfg, batches, sharded=False)
    params_8, losses_8 = _run(cfg, batches, sharded=True)

    # bf16 compute reassociates low-precision sums across devices; f32 only
    # reassociates f32 sums.  Params are f32 masters in both policies.
    rtol = 2e-2 if use_bf16 else 1e-5
    atol = 1e-5 if use_bf16 else 1e-7

    flat_1 = jax.tree_util.tree_leaves_with_path(params_1)
    flat_8 = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(params_8)
    )
    assert len(flat_1) == len(flat_8)
    for key, v1 in flat_1:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(flat_8[ks]), rtol=rtol, atol=atol,
            err_msg=f"param {ks} diverged between 1- and {N_DEV}-device runs",
        )
    np.testing.assert_allclose(
        float(losses_1["all_loss"]), float(losses_8["all_loss"]),
        rtol=(1e-2 if use_bf16 else 1e-5),
    )
