"""End-to-end benchmark: scans/sec for predict (network forward) + SMPL fit.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the full per-scan pipeline at the reference's default shapes
(N=5000 points, 60 anchors, 86 markers, two-stage 30+50-iteration LM fit —
src/train.py:163, fit_SMPL.py:68) with random weights (no trained checkpoint
is required to measure throughput; the compute graph is identical).

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md).  The denominator is the OPTIMISTIC analytic bound from
tools/flops_report.py: 187 GFLOP forward + 590 GFLOP Theseus fit per scan on
an A100 at 19.5 TFLOP/s f32 (TF32 off, train.py:23) with a generous 25%
achieved efficiency and 2 ms/LM-iteration driver overhead => <= 3.13
scans/sec.  A realistic reference rate is far lower (Theseus python-loop
overhead alone is typically >10 ms/iter), so vs_baseline is a LOWER bound on
the true speedup.  Derivation + sensitivity: BASELINE.md.
"""

import json
import os
import sys
import time

import numpy as np

def _enable_compile_cache():
    """Persistent compile cache: repeated bench runs skip the first compile.

    jax is partially pre-imported at interpreter startup on this image, so
    env vars set via os.environ are ignored; jax.config.update is required.
    """
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/jax_cache_etch_bench"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# Optimistic analytic bound on the CUDA reference's end-to-end rate
# (tools/flops_report.py; derivation in BASELINE.md).
BASELINE_SCANS_PER_SEC = 3.13

# batch 8 amortizes per-dispatch and fit overheads (16.9 vs 15.9 scans/sec
# at batch 4 on v5e-1); serving deployments batch scans anyway
BATCH = int(os.environ.get("ETCH_BENCH_BATCH", "8"))
NUM_POINT = int(os.environ.get("ETCH_BENCH_POINTS", "5000"))
REPS = int(os.environ.get("ETCH_BENCH_REPS", "5"))


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from etch_tpu.pipeline import build_pipeline
    from etch_tpu.utils.config import EtchConfig

    # bf16 heads: bandwidth-bound U-Nets stream in bfloat16 with f32
    # accumulation/outputs (inference deployment config; training defaults
    # to f32 like the reference's TF32-off policy)
    cfg = EtchConfig(
        num_point=NUM_POINT, batch_size=BATCH,
        use_bfloat16=os.environ.get("ETCH_BENCH_BF16", "1") == "1",
        dir_chunk=int(os.environ.get("ETCH_BENCH_DIR_CHUNK", "2048")),
    )
    # 86-marker superset ids spread over the synthetic body if no SMPL pkl
    markerset = {f"M{i}": int(v) for i, v in enumerate(
        np.linspace(0, 6889, 86).astype(int)
    )}
    pipe = build_pipeline(
        cfg, markerset, checkpoint_path=None, allow_synthetic_body=True
    )

    rng = np.random.RandomState(0)
    # human-scan-like cloud: points on a scaled vertical capsule
    z = rng.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1).astype(np.float32)

    checksum = jax.jit(lambda v, m: jnp.sum(v) + jnp.sum(m))

    def dispatch_once():
        """Enqueue one fused predict+fit program (run_batch: ONE dispatch
        per batch — the split predict()/fit() path issues ~10, each paying
        tunnel overhead); returns an unfetched device scalar."""
        out = pipe.run_batch(pts)
        return checksum(out["verts"], out["markers"])

    # NOTE: on the axon remote backend block_until_ready does not block;
    # fetching a scalar derived from the outputs is the only reliable
    # synchronization, at the cost of one tunnel roundtrip (~40 ms).
    warm = float(dispatch_once())  # compile + warm
    # a non-finite checksum means the pipeline silently produces garbage —
    # fail the bench rather than report a throughput for broken outputs
    if not np.isfinite(warm):
        print(json.dumps({
            "metric": "end_to_end_scans_per_sec", "value": 0.0,
            "unit": "FAILED: non-finite pipeline checksum %r" % warm,
            "vs_baseline": 0.0,
        }))
        sys.exit(1)

    # Throughput measurement: dispatch all reps back-to-back (JAX async
    # dispatch keeps the device queue full, exactly like a serving loop that
    # doesn't block on each batch) and fetch every checksum at the end.  The
    # ~40 ms tunnel roundtrip is paid once, not once per rep, so no latency
    # subtraction is needed.
    t0 = time.perf_counter()
    sums = [dispatch_once() for _ in range(REPS)]
    for s in sums:
        float(s)
    dt = (time.perf_counter() - t0) / REPS
    dt = max(dt, 1e-6)
    scans_per_sec = BATCH / dt

    # per-request latency (synchronized single batch, incl. one tunnel
    # roundtrip): recorded alongside so the pipelined-throughput headline
    # stays apples-to-apples with serving-latency questions (ADVICE r3 #5)
    t0 = time.perf_counter()
    float(dispatch_once())
    latency_ms = (time.perf_counter() - t0) * 1e3

    # B=1 serving latency (VERDICT r4 next #6): a real batch-1 program —
    # the number a single-request deployment pays, not the B=8 batch sync.
    # Costs one extra compile; ETCH_BENCH_B1=0 skips it (field reads null).
    b1_latency_ms = None
    if os.environ.get("ETCH_BENCH_B1", "1") == "1" and BATCH != 1:
        cfg1 = EtchConfig(
            num_point=NUM_POINT, batch_size=1,
            use_bfloat16=cfg.use_bfloat16, dir_chunk=cfg.dir_chunk,
        )
        pipe1 = build_pipeline(
            cfg1, markerset, checkpoint_path=None, allow_synthetic_body=True
        )
        pts1 = pts[:1]

        def dispatch_b1():
            out = pipe1.run_batch(pts1)
            return checksum(out["verts"], out["markers"])

        float(dispatch_b1())  # compile + warm
        lat = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(dispatch_b1())
            lat.append(time.perf_counter() - t0)
        b1_latency_ms = min(lat) * 1e3

    # Guard against silent Pallas->XLA fallbacks (a Mosaic regression would
    # otherwise read as a quiet perf cliff): on TPU the dispatcher must have
    # taken the Pallas path for every hot op.
    if jax.default_backend() == "tpu":
        from etch_tpu.ops import _dispatch
        taken = _dispatch.paths_taken()
        missing = [op for op in ("fps", "knn", "ball_query")
                   if taken.get(op) != "pallas"]
        if missing:
            print(json.dumps({
                "metric": "end_to_end_scans_per_sec", "value": 0.0,
                "unit": "FAILED: Pallas path not taken for %s" % missing,
                "vs_baseline": 0.0,
            }))
            sys.exit(1)

    print(json.dumps({
        "metric": "end_to_end_scans_per_sec",
        "value": round(scans_per_sec, 4),
        "unit": "scans/sec (pipelined throughput, predict+fit, N=%d, batch=%d;"
                " sync latency %.0f ms/batch)" % (NUM_POINT, BATCH, latency_ms),
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 4),
        "b1_latency_ms": (round(b1_latency_ms, 1)
                          if b1_latency_ms is not None else None),
    }))


if __name__ == "__main__":
    main()
