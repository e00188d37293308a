"""Capture a jax.profiler trace of the end-to-end pipeline (or train step)
and print a per-op device-time summary.

The wall-clock stage timers are unreliable over the axon tunnel
(block_until_ready does not block; per-stage programs recompile differently),
so this goes straight to the horse's mouth: the XLA device trace.  Durations
are aggregated per HLO op-name prefix across all TPU device planes.

Run:  python tools/trace_summary.py [predict|fit|e2e|train]
Env:  ETCH_PROF_BATCH (8), ETCH_PROF_POINTS (5000), ETCH_PROF_REPS (3),
      ETCH_PROF_TOP (40)
"""

import collections
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("ETCH_PROF_BATCH", "8"))
NUM_POINT = int(os.environ.get("ETCH_PROF_POINTS", "5000"))
REPS = int(os.environ.get("ETCH_PROF_REPS", "3"))
TOP = int(os.environ.get("ETCH_PROF_TOP", "40"))


def capture(mode: str, log_dir: str):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_etch_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from etch_tpu.pipeline import build_pipeline
    from etch_tpu.utils.config import EtchConfig

    cfg = EtchConfig(num_point=NUM_POINT, batch_size=BATCH,
                     use_bfloat16=os.environ.get("ETCH_PROF_BF16", "1") == "1")
    markerset = {f"M{i}": int(v) for i, v in enumerate(
        np.linspace(0, 6889, 86).astype(int))}
    pipe = build_pipeline(cfg, markerset, checkpoint_path=None,
                          allow_synthetic_body=True)

    rng = np.random.RandomState(0)
    z = rng.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], -1).astype(np.float32)

    if mode == "train":
        import jax.random as jrandom
        from etch_tpu.train.state import create_train_state, make_train_step
        model, state, tx = create_train_state(
            cfg, jrandom.PRNGKey(0), jnp.zeros((1, NUM_POINT, 3), jnp.float32))
        train_step = make_train_step(model, tx, cfg)
        batch = {
            "hitpts": jnp.asarray(pts),
            "vectors": jnp.asarray(rng.randn(BATCH, NUM_POINT, 3) * 0.01,
                                   jnp.float32),
            "confidences": jnp.asarray(
                rng.rand(BATCH, NUM_POINT, 1), jnp.float32),
            "labels": jnp.asarray(
                rng.randint(0, 86, (BATCH, NUM_POINT)), jnp.int32),
        }

        def run():
            nonlocal state
            state, losses = train_step(state, batch)
            return float(losses["all_loss"])
    elif mode == "e2e":
        # the fused serving program (run_batch) — the path bench.py measures
        def run():
            out = pipe.run_batch(pts)
            return float(jnp.sum(out["verts"]) + jnp.sum(out["markers"]))
    else:
        def run():
            pred = pipe.predict(pts)
            out = float(jnp.sum(pred["inner_points"]))
            if mode == "fit":
                verts, params, markers, valid, joints = pipe.fit(
                    pred["inner_points"], pred["part_labels"],
                    pred["confidences"])
                out += float(jnp.sum(verts))
            return out

    print("warming (compile)...", flush=True)
    run()
    run()
    print("tracing...", flush=True)
    jax.profiler.start_trace(log_dir)
    for _ in range(REPS):
        run()
    jax.profiler.stop_trace()


def summarize(log_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", log_dir)
        return
    path = paths[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    print(f"\nplanes in {os.path.basename(path)}:")
    for p in xs.planes:
        total_events = sum(len(l.events) for l in p.lines)
        print(f"  {p.name}: {len(p.lines)} lines, {total_events} events")

    # The TPU device plane has separate lines: 'XLA Modules' (whole-program
    # spans), 'XLA Ops' (the synchronous op timeline — the critical path) and
    # 'Async XLA Ops' (overlapped DMA).  Aggregate each separately; summing
    # across lines double-counts.
    mods = collections.Counter()
    ops = collections.Counter()        # by opcode
    indiv = collections.Counter()      # by individual instruction
    asyncs = collections.Counter()
    for p in xs.planes:
        if not re.search(r"/device:TPU", p.name):
            continue
        ev_names = p.event_metadata
        for line in p.lines:
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                if line.name == "XLA Modules":
                    mods[re.sub(r"\(\d+\)$", "", name)] += ev.duration_ps
                elif line.name == "XLA Ops":
                    m = re.match(r"%?([A-Za-z0-9_.\-]+)", name)
                    base = re.sub(r"[.\d]+$", "", m.group(1)) if m else name
                    ops[base] += ev.duration_ps
                    indiv[name[:110]] += ev.duration_ps
                elif line.name == "Async XLA Ops":
                    m = re.match(r"%?([A-Za-z0-9_.\-]+)", name)
                    base = re.sub(r"[.\d]+$", "", m.group(1)) if m else name
                    asyncs[base] += ev.duration_ps

    if not ops and not mods:
        print("no device events found (axon may not export a device plane)")
        return
    n = max(REPS, 1)
    ms = lambda ps: ps / 1e12 / n * 1e3
    print(f"\nmodules ({n} reps):")
    for name, ps in mods.most_common(10):
        print(f"  {name[:70]:70s} {ms(ps):9.2f} ms/rep")
    total = sum(ops.values())
    print(f"\nXLA Ops total (sync line): {ms(total):.1f} ms/rep")
    print(f"\n{'opcode':40s} {'ms/rep':>9s} {'%':>6s}")
    for name, ps in ops.most_common(TOP):
        print(f"{name[:40]:40s} {ms(ps):9.2f} {100.0 * ps / total:6.2f}")
    print(f"\ntop individual ops:")
    for name, ps in indiv.most_common(TOP):
        print(f"  {ms(ps):8.2f} ms  {name}")
    atot = sum(asyncs.values())
    print(f"\nAsync (overlapped) total: {ms(atot):.1f} ms/rep")
    for name, ps in asyncs.most_common(12):
        print(f"  {ms(ps):8.2f} ms  {name[:80]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "e2e"
    log_dir = os.environ.get("ETCH_TRACE_DIR", "/tmp/etch_trace_" + mode)
    if os.environ.get("ETCH_TRACE_SUMMARY_ONLY", "0") != "1":
        capture(mode, log_dir)
    summarize(log_dir)
