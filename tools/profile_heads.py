"""Head-level forward breakdown on the real TPU via pred_items subsets.

The earlier stage-isolation harness (tools/mfu_report.py) rebuilt each stage
as its own program and measured nonsense on the axon tunnel (an encoder-only
program slower than the full forward containing it).  This one times the
REAL forward program restricted by `pred_items` — every sub-program is an
exact prefix of the production computation — and differences adjacent
cumulative times.  Sync is a jitted scalar reduction fetched with .item()
(block_until_ready does not block on the axon backend).

Run:  python tools/profile_heads.py
Env:  ETCH_PROF_BATCH (8), ETCH_PROF_POINTS (5000), ETCH_PROF_BF16 (1),
      ETCH_PROF_REPS (10)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("ETCH_PROF_BATCH", "8"))
NUM_POINT = int(os.environ.get("ETCH_PROF_POINTS", "5000"))
USE_BF16 = os.environ.get("ETCH_PROF_BF16", "1") == "1"
REPS = int(os.environ.get("ETCH_PROF_REPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_etch_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from etch_tpu.fit.markers import extract_markers
    from etch_tpu.models.etch_net import EtchNet
    from etch_tpu.utils.config import EtchConfig

    cfg = EtchConfig(num_point=NUM_POINT, batch_size=BATCH,
                     use_bfloat16=USE_BF16)
    model = EtchNet(cfg=cfg)

    rng = np.random.RandomState(0)
    z = rng.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = jnp.asarray(
        np.stack([r * np.cos(th), r * np.sin(th), z], -1), jnp.float32
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        jax.random.PRNGKey(0), pts[:1]
    )

    tiny = jax.jit(lambda x: x + 1)
    tiny(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(10):
        tiny(jnp.zeros(())).item()
    latency = (time.perf_counter() - t0) / 10
    print(f"tunnel latency {latency * 1e3:.1f} ms", flush=True)

    def cumulative(pred_items):
        @jax.jit
        def f(v, p):
            out = model.apply(v, p, train=False, pred_items=pred_items)
            if not out:
                return jnp.zeros(())
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())
        f(variables, pts).item()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(REPS):
            f(variables, pts).item()
        return (time.perf_counter() - t0) / REPS - latency

    stages = [
        ("encoder+prop", ("equiv",)),
        ("+confidence (incl geom)", ("equiv", "confidence")),
        ("+magnitude", ("equiv", "confidence", "magnitude")),
        ("+direction (full)",
         ("equiv", "confidence", "magnitude", "direction")),
    ]
    prev, times = 0.0, {}
    for name, items in stages:
        t = cumulative(items)
        times[name] = t
        print(f"{name:28s} cum {t * 1e3:7.1f} ms   delta {(t - prev) * 1e3:7.1f} ms",
              flush=True)
        prev = t

    # predict + marker extraction + fit increment
    from etch_tpu.pipeline import build_pipeline
    markerset = {f"M{i}": int(v) for i, v in enumerate(
        np.linspace(0, 6889, 86).astype(int))}
    pipe = build_pipeline(cfg, markerset, checkpoint_path=None,
                          allow_synthetic_body=True)

    def full_e2e():
        pred = pipe.predict(pts)
        verts, params, markers, valid, joints = pipe.fit(
            pred["inner_points"], pred["part_labels"], pred["confidences"])
        return float(jnp.sum(verts) + jnp.sum(markers))

    full_e2e()
    t0 = time.perf_counter()
    for _ in range(REPS):
        full_e2e()
    e2e = (time.perf_counter() - t0) / REPS - latency
    print(f"{'predict+fit e2e':28s} cum {e2e * 1e3:7.1f} ms   "
          f"delta {(e2e - prev) * 1e3:7.1f} ms", flush=True)
    print(f"scans/sec at B={BATCH}: {BATCH / e2e:.2f}", flush=True)

    # evidence artifact (VERDICT r4 next #1a): per-stage wall deltas on the
    # REAL forward program (cumulative pred_items prefixes), paired with the
    # analytic FLOP model for achieved-TFLOP/s context.  v5e-1 peaks: 197
    # TF/s bf16 / 49 TF/s f32.
    from tools import flops_report as fr

    from etch_tpu.utils.config import EtchConfig as _C
    cfgf = _C(num_point=NUM_POINT, batch_size=BATCH, use_bfloat16=USE_BF16)
    enc_f, _ = fr.epn_flops(cfgf)
    dir_f = fr.direction_head_flops(NUM_POINT)
    mag_f = fr.pt_unet_flops(NUM_POINT, tuple(cfgf.unet_planes_magnitude))
    conf_f = fr.pt_unet_flops(NUM_POINT, tuple(cfgf.unet_planes_confidence))
    peak = 197e12 if USE_BF16 else 49e12
    names = list(times)
    deltas = [times[names[0]]] + [
        times[names[i]] - times[names[i - 1]] for i in range(1, len(names))]
    stage_flops = {"encoder+prop": enc_f, "+confidence (incl geom)": conf_f,
                   "+magnitude": mag_f, "+direction (full)": dir_f}
    stages = {}
    for nm, dt in zip(names, deltas):
        gflop = stage_flops.get(nm, 0.0) * BATCH / 1e9
        stages[nm] = {
            "delta_ms": round(dt * 1e3, 1),
            "gflop": round(gflop, 1),
            "mfu_pct": round(100.0 * gflop * 1e9 / max(dt, 1e-9) / peak, 2),
        }
    out = {
        "batch": BATCH, "num_point": NUM_POINT, "bf16": USE_BF16,
        "reps": REPS, "tunnel_latency_ms": round(latency * 1e3, 1),
        "stages": stages,
        "e2e_ms": round(e2e * 1e3, 1),
        "scans_per_sec": round(BATCH / e2e, 2),
        "note": "deltas of cumulative pred_items prefixes on the real "
                "forward program; fit increment = e2e - full forward",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "evidence",
                        "mfu_r05.json")
    import json
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(path), flush=True)


if __name__ == "__main__":
    main()
