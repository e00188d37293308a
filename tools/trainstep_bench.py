"""Amortized full-scale train-step timing on the real TPU (VERDICT r3 #4).

Measures s/step for the production-width training step (N=5000, reference
widths) by chaining STEPS dependent `train_step` invocations and fetching ONE
scalar at the end — the axon tunnel roundtrip (~40 ms) divides out, and no
per-step host sync distorts the number (cli/train.py accumulates losses on
device the same way).

The backward's former bottleneck — XLA's TPU scatter emitter for the
gather transposes (~100 GB/s effective, DESIGN.md) — is already replaced by
the one-hot-matmul VJP in ops/grouping.py; this script records what the
step costs with that path in place.

Run:  python tools/trainstep_bench.py        (TPU; compile ~250-350 s)
Env:  ETCH_TS_BATCH (4), ETCH_TS_POINTS (5000), ETCH_TS_STEPS (5),
      ETCH_TS_BF16 (0 — training default is f32 like the reference's
      TF32-off policy)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("ETCH_TS_BATCH", "4"))
NUM_POINT = int(os.environ.get("ETCH_TS_POINTS", "5000"))
STEPS = max(1, int(os.environ.get("ETCH_TS_STEPS", "5")))
USE_BF16 = os.environ.get("ETCH_TS_BF16", "0") == "1"


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_etch_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from etch_tpu.train.state import create_train_state, make_train_step
    from etch_tpu.utils.config import EtchConfig

    cfg = EtchConfig(num_point=NUM_POINT, batch_size=BATCH,
                     use_bfloat16=USE_BF16)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, NUM_POINT, 3), jnp.float32)
    model, state, tx = create_train_state(cfg, rng, example)
    train_step = make_train_step(model, tx, cfg)

    rng_np = np.random.RandomState(0)
    z = rng_np.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng_np.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], -1).astype(np.float32)
    batch = {
        "hitpts": jnp.asarray(pts),
        "vectors": jnp.asarray(
            0.02 * pts / np.linalg.norm(pts, axis=-1, keepdims=True),
            jnp.float32),
        "confidences": jnp.full((BATCH, NUM_POINT, 1), 0.8, jnp.float32),
        "labels": jnp.asarray(rng_np.randint(
            0, cfg.num_markers, (BATCH, NUM_POINT)), jnp.int32),
    }

    t0 = time.time()
    state, losses = train_step(state, batch)
    print(f"compile+first step: {time.time() - t0:.1f} s "
          f"(loss {float(losses['all_loss']):.4f})", flush=True)

    # amortized: STEPS dependent steps, one fetch at the end
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, losses = train_step(state, batch)
    final = float(losses["all_loss"])
    s_per_step = (time.perf_counter() - t0) / STEPS

    out = {
        "batch": BATCH, "num_point": NUM_POINT, "steps": STEPS,
        "bf16": USE_BF16, "s_per_step": round(s_per_step, 3),
        "scans_per_sec_training": round(BATCH / s_per_step, 2),
        "final_loss": round(final, 4),
        # single-device measurement: no data-mesh sharding is applied here,
        # so the figure must not be read as a sharded number (ADVICE r4)
        "devices": jax.device_count(),
    }
    print(json.dumps(out))
    name = "trainstep_bf16.json" if USE_BF16 else "trainstep.json"
    path = os.path.join(REPO, "docs", "evidence", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
