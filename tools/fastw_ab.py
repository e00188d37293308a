"""A/B the fast_w inter-conv (1-pass bf16 kernel-weight matmul) against the
exact HIGHEST path on the real TPU.

fast_w only changes INFERENCE numerics (it activates with bf16 streaming,
EtchConfig.use_bfloat16); this tool quantifies the end-prediction
perturbation on the bundled real 4D-Dress scan with the closed-loop trained
checkpoint when available (random init otherwise — the perturbation bound is
a property of the program, not the params, but trained params give the
deployed-model answer).

    python tools/fastw_ab.py          # prints one JSON line

Reported: direction cosine between the two paths, part-label agreement,
magnitude/confidence mean abs diff, and predicted-marker mean offset (cm).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPT = os.environ.get("ETCH_FASTW_CKPT", "/tmp/etch_closed_loop/ckpt")
NUM_POINT = int(os.environ.get("ETCH_FASTW_N", "5000"))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_etch_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from etch_tpu.fit.markers import extract_markers
    from etch_tpu.models.etch_net import EtchNet
    from etch_tpu.utils.config import EtchConfig

    cfg = EtchConfig(num_point=NUM_POINT, use_bfloat16=True)
    model = EtchNet(cfg)
    rng = jax.random.PRNGKey(0)

    # batch: the bundled real scan when present, synthetic tube otherwise
    scan_obj = os.path.join(
        REPO, "datafolder", "4D-DRESS", "data_processed", "model",
        "00122_Inner_Take2_00011", "00122_Inner_Take2_00011.obj")
    if os.path.isfile(scan_obj):
        from etch_tpu.data.mesh import load_obj
        from etch_tpu.data.sampling import sample_surface
        mesh = load_obj(scan_obj)
        pts = sample_surface(mesh, NUM_POINT, seed=0)[0][None]
        srcname = "real_scan"
    else:
        r = np.random.RandomState(0)
        z = r.uniform(-0.9, 0.9, (1, NUM_POINT))
        th = r.uniform(0, 2 * np.pi, (1, NUM_POINT))
        rad = 0.15 + 0.03 * np.cos(3 * z)
        pts = np.stack([rad * np.cos(th), rad * np.sin(th), z], -1)
        srcname = "synthetic"
    pts = jnp.asarray(pts, jnp.float32)

    variables = model.init(rng, jnp.zeros((1, NUM_POINT, 3), jnp.float32))
    params_src = "random_init"
    if os.path.isdir(CKPT):
        try:
            from etch_tpu.train.checkpoint import restore_params
            params, batch_stats = restore_params(CKPT)
            variables = {"params": params, "batch_stats": batch_stats}
            params_src = CKPT
        except Exception as e:  # stale/incompatible ckpt: fall back loudly
            print(f"ckpt restore failed ({e}); using random init",
                  file=sys.stderr, flush=True)

    def fwd_factory():
        # separate jit instances so each traces with the env var AT CALL
        # TIME (ETCH_FAST_W is read during tracing in nn/epn.py)
        @jax.jit
        def f(v, p):
            return model.apply(v, p, train=False)
        return f

    # three inference programs: fully exact, the DEFAULT (fast_w on the
    # occupancy kernel only — no contraction dots to disturb), and fast_w on
    # every conv (env-gated experiment)
    os.environ["ETCH_FAST_W"] = "1"
    os.environ["ETCH_FAST_W_ONES"] = "1"
    fast = jax.tree.map(np.asarray, fwd_factory()(variables, pts))
    os.environ["ETCH_FAST_W"] = "0"
    ones = jax.tree.map(np.asarray, fwd_factory()(variables, pts))
    os.environ["ETCH_FAST_W_ONES"] = "0"
    exact = jax.tree.map(np.asarray, fwd_factory()(variables, pts))

    nan_report = {
        f"{tag}_{k}_nan": int(np.isnan(out[k]).sum())
        for tag, out in (("fast", fast), ("exact", exact))
        for k in ("direction", "magnitude", "part_labels", "confidences")
    }
    def versus(a, b):
        return {
            "direction_cosine": round(float(np.mean(
                np.sum(a["direction"] * b["direction"], -1))), 6),
            "label_agreement": round(float(np.mean(
                np.argmax(a["part_labels"], -1)
                == np.argmax(b["part_labels"], -1))), 6),
            "magnitude_mean_abs_diff": round(float(np.mean(
                np.abs(a["magnitude"] - b["magnitude"]))), 6),
            "confidence_mean_abs_diff": round(float(np.mean(
                np.abs(a["confidences"] - b["confidences"]))), 6),
        }
    cos = float(np.mean(np.sum(fast["direction"] * exact["direction"], -1)))
    lbl = float(np.mean(np.argmax(fast["part_labels"], -1)
                        == np.argmax(exact["part_labels"], -1)))
    mag = float(np.mean(np.abs(fast["magnitude"] - exact["magnitude"])))
    conf = float(np.mean(np.abs(fast["confidences"] - exact["confidences"])))

    def markers(out):
        inner = pts - jnp.asarray(out["direction"]) * jnp.asarray(
            out["magnitude"]) / cfg.scale_magnitude
        mk, valid = extract_markers(
            inner, jnp.argmax(jnp.asarray(out["part_labels"]), -1),
            jnp.asarray(out["confidences"]), num_markers=cfg.num_markers)
        return np.asarray(mk), np.asarray(valid)

    mk_f, val_f = markers(fast)
    mk_e, val_e = markers(exact)
    mk_o, val_o = markers(ones)
    both = val_f & val_e
    mk_cm = float(np.linalg.norm(mk_f[both] - mk_e[both], axis=-1).mean()
                  * 100.0) if both.any() else float("nan")
    both_o = val_o & val_e
    mk_cm_o = float(np.linalg.norm(mk_o[both_o] - mk_e[both_o], axis=-1
                                   ).mean() * 100.0
                    ) if both_o.any() else float("nan")

    out = {
        "source": srcname, "params": params_src,
        "direction_cosine_fast_vs_exact": round(cos, 6),
        "label_agreement": round(lbl, 6),
        "magnitude_mean_abs_diff": round(mag, 6),
        "confidence_mean_abs_diff": round(conf, 6),
        "marker_mean_offset_cm": round(mk_cm, 4),
        "markers_valid_both": int(both.sum()),
        # the DEFAULT config (fast_w on the occupancy kernel only) vs exact
        "ones_default_vs_exact": {
            **versus(ones, exact),
            "marker_mean_offset_cm": round(mk_cm_o, 4),
            "markers_valid_both": int(both_o.sum()),
        },
        **nan_report,
    }
    print(json.dumps(out), flush=True)
    path = os.path.join(REPO, "docs", "evidence", "fastw_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
