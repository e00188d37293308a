"""Tests for losses and training-state machinery."""

import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.train.losses import compute_losses
from etch_tpu.utils.config import EtchConfig


def _fake_outputs(rng, B=2, N=16, L=86):
    return {
        "direction": rng.randn(B, N, 3).astype(np.float32),
        "magnitude": rng.randn(B, N, 1).astype(np.float32),
        "confidences": rng.rand(B, N, 1).astype(np.float32),
        "part_labels": rng.randn(B, N, L).astype(np.float32),
    }


def test_losses_match_reference_formulas():
    rng = np.random.RandomState(0)
    cfg = EtchConfig()
    B, N = 2, 16
    out = _fake_outputs(rng, B, N)
    vectors = rng.randn(B, N, 3).astype(np.float32)
    conf = rng.rand(B, N, 1).astype(np.float32)
    labels = rng.randint(0, 86, (B, N))

    losses = compute_losses(cfg, out, vectors, conf, jnp.asarray(labels))

    # direction: mean(1 - cos)
    vn = vectors / np.linalg.norm(vectors, axis=-1, keepdims=True)
    pn = out["direction"] / np.linalg.norm(out["direction"], axis=-1, keepdims=True)
    ref_dir = np.mean(1 - np.sum(vn * pn, -1))
    np.testing.assert_allclose(float(losses["direction_loss"]), ref_dir, rtol=1e-4)

    # magnitude: mse(|v| * 10, pred)
    norms = np.linalg.norm(vectors, axis=-1, keepdims=True)
    ref_mag = np.mean((norms * 10 - out["magnitude"]) ** 2)
    np.testing.assert_allclose(float(losses["magnitude_loss"]), ref_mag, rtol=1e-4)

    # confidence mse
    ref_conf = np.mean((out["confidences"] - conf) ** 2)
    np.testing.assert_allclose(float(losses["confidence_loss"]), ref_conf, rtol=1e-4)

    # cross entropy
    logits = out["part_labels"]
    lse = np.log(np.exp(logits).sum(-1))
    ref_ce = np.mean(lse - np.take_along_axis(logits, labels[..., None], -1)[..., 0])
    np.testing.assert_allclose(float(losses["part_label_loss"]), ref_ce, rtol=1e-4)

    total = sum(
        float(v) for k, v in losses.items() if k != "all_loss"
    )
    np.testing.assert_allclose(float(losses["all_loss"]), total, rtol=1e-5)


def test_loss_weights_scale():
    rng = np.random.RandomState(1)
    cfg = EtchConfig(direction_w=2.0, magnitude_w=0.5)
    out = _fake_outputs(rng)
    vectors = rng.randn(2, 16, 3).astype(np.float32)
    conf = rng.rand(2, 16, 1).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 86, (2, 16)))
    l1 = compute_losses(cfg, out, vectors, conf, labels)
    l2 = compute_losses(EtchConfig(), out, vectors, conf, labels)
    np.testing.assert_allclose(
        float(l1["direction_loss"]), 2 * float(l2["direction_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(l1["magnitude_loss"]), 0.5 * float(l2["magnitude_loss"]), rtol=1e-5
    )


def test_gmm_prior():
    from etch_tpu.fit.prior import synthetic_gmm

    prior = synthetic_gmm()
    pose = jnp.zeros((2, 69))
    nll0 = np.asarray(prior(pose))
    # far poses must be less likely
    nll_far = np.asarray(prior(jnp.ones((2, 69)) * 3.0))
    assert (nll_far > nll0).all()


def test_nan_batch_skips_entire_update():
    """A non-finite loss must leave params AND Adam moments/step untouched —
    the reference `continue`s past optimizer.step() (src/train.py:111-123).
    Runtime on the 1-core CI host: ~40 s (tiny config)."""
    from etch_tpu.train.state import create_train_state, make_train_step

    cfg = EtchConfig.tiny(num_point=64, batch_size=1)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, cfg.num_point, 3), jnp.float32)
    model, state, tx = create_train_state(cfg, rng, example)
    train_step = make_train_step(model, tx, cfg)

    rs = np.random.RandomState(0)
    v = rs.randn(1, cfg.num_point, 3).astype(np.float32)
    batch = {
        "hitpts": (0.2 * v / np.linalg.norm(v, axis=-1, keepdims=True)),
        "vectors": rs.randn(1, cfg.num_point, 3).astype(np.float32) * 0.01,
        "confidences": rs.rand(1, cfg.num_point, 1).astype(np.float32),
        "labels": rs.randint(0, 86, (1, cfg.num_point)).astype(np.int32),
    }
    # NaN target vectors -> NaN MSE loss
    nan_batch = dict(batch, vectors=np.full_like(batch["vectors"], np.nan))

    new_state, losses = train_step(state, nan_batch)
    assert not np.isfinite(float(losses["all_loss"]))
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"param {jax.tree_util.keystr(kp)} moved on a NaN batch",
        )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(state.opt_state),
        jax.tree_util.tree_leaves_with_path(new_state.opt_state),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"opt_state {jax.tree_util.keystr(kp)} moved on a NaN batch",
        )
    # a clean batch through the same compiled step must still update
    upd_state, losses = train_step(state, batch)
    assert np.isfinite(float(losses["all_loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(upd_state.params),
        )
    )
    assert moved, "finite-loss batch did not update params"


def test_marker_extraction_underflow_safe():
    """conf^20 must not underflow for small confidences (the stable-weights
    path); reference raw conf**20 underflows below ~1e-16."""
    from etch_tpu.fit.markers import extract_markers

    pts = np.array([[[0, 0, 0], [1, 1, 1], [2, 2, 2]]], dtype=np.float32)
    labels = jnp.asarray(np.zeros((1, 3), np.int32))
    conf = jnp.asarray(np.array([[[1e-8], [2e-8], [1e-9]]], np.float32))
    centers, valid = extract_markers(pts, labels, conf, num_markers=2)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])
    c = np.asarray(centers[0, 0])
    assert np.isfinite(c).all()
    # the 2e-8 point dominates with weight (2/2)^20 vs (1/2)^20 vs tiny
    np.testing.assert_allclose(c, [1, 1, 1], atol=0.01)
