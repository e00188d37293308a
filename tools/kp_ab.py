"""Kernel-point layout A/B: reference kpsphere ply dispositions vs generated
repulsion layout (round-1 VERDICT next-step #8).

Runs the fixed-seed synthetic overfit harness (tests/test_overfit.py setup)
once per layout on identical data/seed and reports the loss trajectory and
final direction cosine.  Model capacity and optimization are identical; only
the 24 kernel-point positions differ, so any gap is the inductive-bias cost
of the layout.  Result recorded in docs/DESIGN.md.

Run:  ETCH_KP_LAYOUT=reference python tools/kp_ab.py
      ETCH_KP_LAYOUT=repulsion python tools/kp_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_etch_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

STEPS = int(os.environ.get("ETCH_KP_AB_STEPS", "150"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from etch_tpu.geometry.kernel_points import default_layout
    from etch_tpu.train.losses import compute_losses
    from etch_tpu.train.state import create_train_state
    from etch_tpu.utils.config import EtchConfig

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_overfit import BATCH, LR, N_POINT, _synthetic_batch

    layout = default_layout()
    cfg = EtchConfig(num_point=N_POINT, batch_size=BATCH, lr=LR)
    batch = _synthetic_batch(np.random.RandomState(42))

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, N_POINT, 3), jnp.float32)
    model, state, _ = create_train_state(cfg, rng, example)
    tx = optax.adam(LR)
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
        return losses["all_loss"], (losses, mutated["batch_stats"])

    @jax.jit
    def step(params, batch_stats, opt_state):
        (loss, (_, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    params, stats = state.params, state.batch_stats
    log = []
    for i in range(STEPS):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        log.append(float(loss))

    outputs = model.apply(
        {"params": params, "batch_stats": stats}, batch["hitpts"], train=False
    )
    pred_dir = np.asarray(outputs["direction"])
    gt = batch["vectors"]
    gt_dir = gt / np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True), 1e-8)
    pd = pred_dir / np.maximum(
        np.linalg.norm(pred_dir, axis=-1, keepdims=True), 1e-8
    )
    cosine = float(np.mean(np.sum(gt_dir * pd, axis=-1)))

    print(json.dumps({
        "layout": layout,
        "steps": STEPS,
        "loss0": round(log[0], 5),
        "loss_mid": round(log[STEPS // 2], 5),
        "loss_final_mean5": round(float(np.mean(log[-5:])), 5),
        "ratio_final": round(float(np.mean(log[-5:]) / log[0]), 5),
        "direction_cosine": round(cosine, 5),
    }))


if __name__ == "__main__":
    main()
