"""Shared fixed-seed overfit harness (model-quality evidence).

The first signal toward the V2V north star without a training dataset: the
full production EtchNet (EPN encoder + all three heads, reference widths)
trained on 8 fixed synthetic scans with analytic GT must drive the loss to a
small fraction of its initial value and align the direction head with the
analytic directions (reference loss set `src/train.py:81-101`).

Synthetic GT construction: scan points live on a bumpy capsule; the "body"
is the smooth capsule underneath, so the analytic tightness vector is the
radial offset (direction = inward radial, magnitude = bump height), the part
label bins the axial coordinate into 86 parts, and confidence decays with
magnitude (mirroring conf = exp(-10 d) of `GT_dataloader.py:57-60`).

Consumed by:
  * tests/test_overfit.py — a short CPU smoke run (the full 150-step run
    takes ~2.5 h on the 1-core CI host) + validation of the checked-in
    full-gate artifact;
  * tools/overfit_evidence.py — the full 150-step gate on the TPU, writing
    docs/evidence/overfit_tpu.json.
"""

from __future__ import annotations

import numpy as np

BATCH = 8
N_POINT = 512  # smallest N that keeps >=2 points at the U-Net's coarsest level
LR = 2e-3      # overfit-rate Adam; production training uses cfg.lr = 1e-4


def make_batch(rng: np.random.RandomState, batch: int = BATCH,
               n_point: int = N_POINT) -> dict:
    z = rng.uniform(-0.9, 0.9, (batch, n_point))
    th = rng.uniform(0, 2 * np.pi, (batch, n_point))
    bump = 0.02 + 0.015 * np.sin(4 * z) * np.cos(2 * th)   # cloth offset
    r_body = 0.15
    r_scan = r_body + bump
    cos_t, sin_t = np.cos(th), np.sin(th)
    pts = np.stack([r_scan * cos_t, r_scan * sin_t, z], axis=-1)
    # tightness vector: scan point -> body surface (radial, inward)
    vectors = np.stack([bump * cos_t, bump * sin_t, np.zeros_like(z)], axis=-1)
    labels = np.clip(((z + 0.9) / 1.8 * 86).astype(np.int32), 0, 85)
    conf = np.exp(-10.0 * bump)[..., None]
    return {
        "hitpts": pts.astype(np.float32),
        "vectors": vectors.astype(np.float32),
        "confidences": conf.astype(np.float32),
        "labels": labels,
    }


def run(steps: int, lr: float = LR, batch_size: int = BATCH,
        n_point: int = N_POINT, seed: int = 42, verbose: bool = False) -> dict:
    """Train the full EtchNet on the fixed synthetic batch for `steps` Adam
    steps.  Returns {"losses": [per-step], "cosine": float, "initial": float,
    "final": float} (final = mean of the last 5 recorded losses)."""
    import jax
    import jax.numpy as jnp
    import optax

    from etch_tpu.train.losses import compute_losses
    from etch_tpu.train.state import create_train_state
    from etch_tpu.utils.config import EtchConfig

    cfg = EtchConfig(num_point=n_point, batch_size=batch_size, lr=lr)
    batch = make_batch(np.random.RandomState(seed), batch_size, n_point)

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, n_point, 3), jnp.float32)
    model, state, _ = create_train_state(cfg, rng, example)
    tx = optax.adam(lr)
    opt_state = tx.init(state.params)

    def loss_fn(params, batch_stats):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["hitpts"], train=True, mutable=["batch_stats"],
        )
        losses = compute_losses(
            cfg, outputs, batch["vectors"], batch["confidences"],
            batch["labels"],
        )
        return losses["all_loss"], mutated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    params, stats = state.params, state.batch_stats
    losses_log = []
    for i in range(steps):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        lf = float(loss)
        losses_log.append(lf)
        if verbose:
            print(f"step {i}: loss {lf:.4f}", flush=True)

    # direction head quality: mean cosine between predicted direction and
    # the analytic GT direction
    outputs = model.apply(
        {"params": params, "batch_stats": stats},
        batch["hitpts"], train=False,
    )
    pred_dir = np.asarray(outputs["direction"])
    gt = batch["vectors"]
    gt_dir = gt / np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True), 1e-8)
    pd = pred_dir / np.maximum(
        np.linalg.norm(pred_dir, axis=-1, keepdims=True), 1e-8
    )
    cosine = float(np.mean(np.sum(gt_dir * pd, axis=-1)))

    return {
        "losses": losses_log,
        "initial": losses_log[0],
        "final": float(np.mean(losses_log[-5:])),
        "cosine": cosine,
        "steps": steps,
        "lr": lr,
        "batch": batch_size,
        "n_point": n_point,
        "seed": seed,
    }
