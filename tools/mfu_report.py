"""Per-stage achieved-FLOP/s (MFU) report on the real TPU.

Times each pipeline stage in isolation (encoder, each head, query geometry,
feature propagation, LM fit) with jit-compiled stage functions, pairs the
wall-clock with the analytic per-stage FLOP counts from tools/flops_report.py,
and prints achieved TFLOP/s vs the chip peak.  Output feeds the MFU table in
docs/DESIGN.md (round-1 VERDICT weak #2: "no MFU number is reported
anywhere").

Stage isolation: every stage runs as its own jitted function on the same
inputs the full forward would feed it, so times include each stage's own HBM
traffic but not the others' compute.  The axon tunnel latency (~40 ms) is
measured and subtracted per dispatch.

Run:  python tools/mfu_report.py         (needs the TPU; ~2 min incl compile)
Env:  ETCH_MFU_BATCH (default 8), ETCH_MFU_POINTS (default 5000),
      ETCH_MFU_BF16 (default 1), ETCH_MFU_REPS (default 10)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_etch_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BATCH = int(os.environ.get("ETCH_MFU_BATCH", "8"))
NUM_POINT = int(os.environ.get("ETCH_MFU_POINTS", "5000"))
USE_BF16 = os.environ.get("ETCH_MFU_BF16", "1") == "1"
REPS = int(os.environ.get("ETCH_MFU_REPS", "10"))

# v5e peaks (per chip): 197 TFLOP/s bf16, ~49 TFLOP/s f32 on the MXU.
PEAK_BF16 = 197e12
PEAK_F32 = 49e12


def main():
    import jax
    import jax.numpy as jnp

    from etch_tpu.models.etch_net import EtchNet
    from etch_tpu.nn.point_transformer import unet_geometry
    from etch_tpu.ops.interpolate import knn_interpolate
    from etch_tpu.utils.config import EtchConfig
    from tools import flops_report as fr

    cfg = EtchConfig(
        num_point=NUM_POINT, batch_size=BATCH, use_bfloat16=USE_BF16
    )
    model = EtchNet(cfg=cfg)
    rng = np.random.RandomState(0)
    z = rng.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = jnp.asarray(
        np.stack([r * np.cos(th), r * np.sin(th), z], -1), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), pts[:1], train=False)

    # tunnel roundtrip latency (subtracted per dispatch)
    tiny = jax.jit(lambda x: x + 1)
    tiny(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(10):
        tiny(jnp.zeros(())).item()
    latency = (time.perf_counter() - t0) / 10

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        # force a scalar fetch for axon-safe sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
            s = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x[..., :1]), out, jnp.zeros(())
            )
            float(s)
        return max((time.perf_counter() - t0) / REPS - latency, 1e-9)

    @jax.jit
    def f_encoder(v, x):
        cloud, _ = model.apply(v, x, method=lambda m, y: m.encoder(y))
        return cloud.feats

    @jax.jit
    def f_geom(x):
        g = unet_geometry(x)
        return jax.tree.leaves(g)[:4]

    def head_fn(items):
        @jax.jit
        def f(v, x):
            return model.apply(v, x, train=False, pred_items=items)
        return f

    f_dir = head_fn(("direction",))
    f_mag = head_fn(("magnitude",))
    f_conf = head_fn(("confidence",))
    f_full = head_fn(("confidence", "direction", "magnitude"))

    @jax.jit
    def f_prop(v, x):
        cloud, _ = model.apply(v, x, method=lambda m, y: m.encoder(y))
        B, K, A, C = (cloud.feats.shape[0], cloud.feats.shape[1],
                      cloud.feats.shape[2], cloud.feats.shape[3])
        flat = cloud.feats.transpose(0, 1, 3, 2).reshape(B, K, C * A)
        return knn_interpolate(cloud.xyz, x, flat, k=3, use_sqrt=False)

    t_enc = timeit(f_encoder, variables, pts)
    t_geom = timeit(f_geom, pts)
    t_prop = timeit(f_prop, variables, pts) - t_enc
    t_dir = timeit(f_dir, variables, pts) - t_enc - t_prop
    t_mag = timeit(f_mag, variables, pts) - t_enc - t_prop - t_geom
    t_conf = timeit(f_conf, variables, pts) - t_enc - t_prop - t_geom
    t_full = timeit(f_full, variables, pts)

    # analytic per-stage FLOPs (per scan) from the shared architecture model
    enc_f, _ = fr.epn_flops(cfg)
    dir_f = fr.direction_head_flops(NUM_POINT)
    mag_f = fr.pt_unet_flops(NUM_POINT, (64, 128, 256, 256, 512))
    conf_f = fr.pt_unet_flops(NUM_POINT, (128, 128, 256, 256, 512))
    fp_f = fr.featprop_flops(NUM_POINT, NUM_POINT // 4, 3840)
    # query geometry = the knn/fps/interp-idx terms; tiny FLOPs, all gather
    gf = {
        "encoder (EPN, 4 separable convs)": (t_enc, enc_f / 1e9),
        "U-Net query geometry (shared)": (t_geom, 0.6),
        "3-NN feature propagation": (t_prop, fp_f / 1e9),
        "direction head": (t_dir, dir_f / 1e9),
        "magnitude U-Net": (t_mag, mag_f / 1e9),
        "confidence U-Net": (t_conf, conf_f / 1e9),
        "full forward": (t_full,
                         (enc_f + dir_f + mag_f + conf_f + fp_f) / 1e9),
    }

    peak = PEAK_BF16 if USE_BF16 else PEAK_F32
    print(f"\n== per-stage MFU (B={BATCH}, N={NUM_POINT}, "
          f"bf16={USE_BF16}, v5e peak {'197' if USE_BF16 else '49'} TF/s) ==")
    print(f"{'stage':44s} {'ms':>8s} {'GFLOP':>8s} {'TF/s':>7s} {'MFU%':>6s}")
    rows = {}
    for name, (t, gflop_per_scan) in gf.items():
        gflop = gflop_per_scan * BATCH
        tfs = gflop * 1e9 / t / 1e12
        mfu = 100.0 * gflop * 1e9 / t / peak
        rows[name] = {"ms": round(t * 1e3, 2), "gflop": round(gflop, 1),
                      "tflops": round(tfs, 2), "mfu_pct": round(mfu, 2)}
        print(f"{name:44s} {t*1e3:8.2f} {gflop:8.1f} {tfs:7.2f} {mfu:6.2f}")
    print(f"\n(sum of stages {sum(v[0] for k, v in gf.items() if k != 'full forward')*1e3:.1f} ms"
          f" vs full forward {t_full*1e3:.1f} ms; diff = XLA cross-stage fusion"
          f" + per-dispatch overhead)")
    print(json.dumps({"batch": BATCH, "num_point": NUM_POINT,
                      "bf16": USE_BF16, "latency_ms": round(latency*1e3, 1),
                      "stages": rows}))


if __name__ == "__main__":
    main()
