"""Real-data closed loop (VERDICT round-2 #4): overfit the production model
on the bundled 4D-Dress sample through the REAL GT pipeline, then show the
quality metrics and the eval-CLI V2V drop far below their random-weights
values.

Everything upstream is the real pipeline — surface sampling, 1 cm
nearest-info-vector rule, heat-method geodesic labels/confidences
(reference `src/data_utils/GT_dataloader.py:85-180`) — not the synthetic
capsule harness.  The quality anchor the reference records is V2V ~1.939 cm
with real licensed SMPL body models (`compute_mpjpe_error.py:5`); those pkls
are not redistributable, so the absolute V2V here (synthetic smoke-test
body) is not comparable — what this artifact pins down is the *closed loop*:
training on real GT moves every metric, including end-to-end eval V2V, far
off its untrained value.

Run on the TPU:

    python tools/realdata_closed_loop.py   # writes docs/evidence/realdata_closed_loop.json

Gates: predicted-marker error and eval V2V drop below 50% of their
random-weights values; direction cosine > 0.9 after training.
"""

import functools
import json
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE_ID = "00122_Inner_Take2_00011"
DATA = os.path.join(REPO, "datafolder")

STEPS = int(os.environ.get("ETCH_CLOSED_LOOP_STEPS", "300"))
NUM_POINT = int(os.environ.get("ETCH_CLOSED_LOOP_N", "5000"))
BATCH = int(os.environ.get("ETCH_CLOSED_LOOP_B", "4"))
LR = float(os.environ.get("ETCH_CLOSED_LOOP_LR", "1e-3"))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_etch_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def build_batch(markerset):
    """B samplings of the one bundled scan through the real GT pipeline."""
    from etch_tpu.data.dataset import DatasetPaths, load_item

    paths = DatasetPaths(
        scan_dir=os.path.join(DATA, "4D-DRESS", "data_processed", "model"),
        smpl_dir=os.path.join(DATA, "4D-DRESS", "data_processed", "smplh"),
        infopoints_dir=os.path.join(DATA, "gt_4D-Dress_data", "npz"),
    )
    vids = list(markerset.values())
    items = []
    for s in range(BATCH):
        t0 = time.time()
        items.append(load_item(paths, SAMPLE_ID, NUM_POINT, vids, seed=s))
        print(f"item seed={s} built in {time.time() - t0:.1f}s", flush=True)
    batch = {
        k: np.stack([it[k] for it in items])
        for k in ("hitpts", "vectors", "confidences", "labels")
    }
    return batch


def gt_markers(markerset):
    from etch_tpu.data.mesh import load_obj

    smpl_mesh = load_obj(
        os.path.join(
            DATA, "4D-DRESS", "data_processed", "smplh",
            SAMPLE_ID, f"mesh_smpl_{SAMPLE_ID}.obj",
        )
    )
    vids = np.asarray(list(markerset.values()), np.int64)
    return smpl_mesh.vertices[vids].astype(np.float32)  # (86, 3)


@functools.lru_cache(maxsize=1)
def _jit_forward(model):
    import jax

    # un-jitted model.apply would dispatch op-by-op over the axon tunnel
    return jax.jit(lambda v, p: model.apply(v, p, train=False))


def metrics(model, state, batch, gt_mk, cfg):
    """Quality metrics of the current params on the real batch."""
    import jax.numpy as jnp

    from etch_tpu.fit.markers import extract_markers

    out = _jit_forward(model)(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["hitpts"]),
    )
    dirs = np.asarray(out["direction"])  # (B,N,3) unit
    mag = np.asarray(out["magnitude"])  # (B,N,1), x10 scale
    gt_v = batch["vectors"]
    gt_norm = np.linalg.norm(gt_v, axis=-1, keepdims=True)
    gt_dir = gt_v / np.maximum(gt_norm, 1e-9)
    cosine = float(np.mean(np.sum(dirs * gt_dir, axis=-1)))
    mag_mae = float(
        np.mean(np.abs(mag[..., 0] / cfg.scale_magnitude - gt_norm[..., 0]))
    )
    label_acc = float(
        np.mean(np.argmax(np.asarray(out["part_labels"]), -1) == batch["labels"])
    )
    inner = jnp.asarray(batch["hitpts"]) - out["direction"] * out["magnitude"] / cfg.scale_magnitude
    mk, valid = extract_markers(
        inner,
        jnp.argmax(out["part_labels"], -1),
        out["confidences"],
        num_markers=cfg.num_markers,
    )
    mk, valid = np.asarray(mk), np.asarray(valid)
    err = np.linalg.norm(mk - gt_mk[None], axis=-1)  # (B, 86)
    marker_err_cm = float(np.mean(err[valid]) * 100.0)
    return {
        "direction_cosine": round(cosine, 4),
        "magnitude_mae_m": round(mag_mae, 5),
        "label_acc": round(label_acc, 4),
        "marker_err_cm": round(marker_err_cm, 3),
        "markers_valid": int(valid.sum()) / valid.shape[0],
    }


def run_eval_cli(tag, model_path, workdir):
    """Full eval CLI (forward -> markers -> two-stage LM fit -> V2V) on the
    bundled sample; returns the mean V2V in cm from v2v_score.txt."""
    from etch_tpu.cli import evaluate

    ids_pkl = os.path.join(workdir, f"ids_{tag}.pkl")
    with open(ids_pkl, "wb") as f:
        pickle.dump([SAMPLE_ID], f)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        argv = [
            "--num_point", str(NUM_POINT),
            "--batch_size", "1",
            "--num_workers", "0",
            "--i", f"closed_loop_{tag}",
            "--markerset_path",
            os.path.join(DATA, "useful_data_4d-dress", "superset_smpl.json"),
            "--activated_ids_path", ids_pkl,
            "--scan_dir", os.path.join(DATA, "4D-DRESS", "data_processed", "model"),
            "--smpl_dir", os.path.join(DATA, "4D-DRESS", "data_processed", "smplh"),
            "--infopoints_dir", os.path.join(DATA, "gt_4D-Dress_data", "npz"),
            "--allow_synthetic_body",
            "--no-save_debug",
        ]
        if model_path:
            argv += ["--model_path", model_path]
        evaluate.main(argv)
        score = os.path.join(
            workdir, "all_experiments", "experiments",
            f"eval_outputs_closed_loop_{tag}", "v2v_score.txt",
        )
        with open(score) as f:
            lines = [l for l in f.read().splitlines() if l.strip()]
        # reference src/eval.py:254-265 format; "average v2v:" is in meters
        mean_m = next(
            float(l.split()[-1]) for l in lines if l.startswith("average v2v:")
        )
        return mean_m * 100.0
    finally:
        os.chdir(cwd)


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from etch_tpu.train.checkpoint import save_train_state
    from etch_tpu.train.state import create_train_state, make_train_step
    from etch_tpu.utils.config import EtchConfig

    with open(
        os.path.join(DATA, "useful_data_4d-dress", "superset_smpl.json")
    ) as f:
        markerset = json.load(f)

    print(f"building {BATCH} real-GT samplings of {SAMPLE_ID} "
          f"(N={NUM_POINT})...", flush=True)
    batch = build_batch(markerset)
    gt_mk = gt_markers(markerset)

    cfg = EtchConfig(num_point=NUM_POINT, batch_size=BATCH, lr=LR)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, NUM_POINT, 3), jnp.float32)
    # cosine-decayed Adam: constant lr plateaus ~2x higher on this fixed
    # batch (Adam oscillates near the optimum); decay to lr/20 by the end
    import optax
    sched = optax.cosine_decay_schedule(LR, STEPS, alpha=0.05)
    model, state, tx = create_train_state(
        cfg, rng, example, tx=optax.adam(sched)
    )
    train_step = make_train_step(model, tx, cfg)

    before = metrics(model, state, batch, gt_mk, cfg)
    print("before:", json.dumps(before), flush=True)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    t0 = time.time()
    losses = None
    loss_trace = []
    for i in range(STEPS):
        state, losses = train_step(state, jbatch)
        if i % 25 == 0 or i == STEPS - 1:
            l = float(losses["all_loss"])
            loss_trace.append(round(l, 4))
            comps = " ".join(
                f"{k.replace('_loss', '')}={float(v):.4f}"
                for k, v in sorted(losses.items()) if k != "all_loss"
            )
            print(f"step {i:4d} loss {l:.4f} [{comps}] "
                  f"({(time.time() - t0) / (i + 1):.3f} s/step)", flush=True)
    train_s = time.time() - t0

    after = metrics(model, state, batch, gt_mk, cfg)
    print("after:", json.dumps(after), flush=True)

    # end-to-end eval CLI V2V, random weights vs trained checkpoint
    workdir = "/tmp/etch_closed_loop"
    os.makedirs(workdir, exist_ok=True)
    ckpt_dir = os.path.join(workdir, "ckpt")
    save_train_state(ckpt_dir, STEPS, state, cfg.to_json())
    print("running eval CLI with random weights...", flush=True)
    v2v_before = run_eval_cli("random", None, workdir)
    print(f"V2V random: {v2v_before:.3f} cm", flush=True)
    print("running eval CLI with the trained checkpoint...", flush=True)
    v2v_after = run_eval_cli("trained", ckpt_dir, workdir)
    print(f"V2V trained: {v2v_after:.3f} cm", flush=True)

    result = {
        "sample_id": SAMPLE_ID,
        "steps": STEPS,
        "num_point": NUM_POINT,
        "batch": BATCH,
        "lr": LR,
        "backend": jax.default_backend(),
        "train_seconds": round(train_s, 1),
        "loss_trace": loss_trace,
        "before": before,
        "after": after,
        "v2v_cm_random": round(v2v_before, 3),
        "v2v_cm_trained": round(v2v_after, 3),
        "note": (
            "synthetic smoke-test body (real SMPL pkls are not "
            "redistributable): absolute V2V is not comparable to the "
            "reference's 1.939 cm; the claim is the closed-loop DROP"
        ),
        "pass_marker": after["marker_err_cm"] < 0.5 * before["marker_err_cm"],
        "pass_cosine": after["direction_cosine"] > 0.9,
        "pass_v2v": v2v_after < 0.5 * v2v_before,
    }
    out = os.path.join(REPO, "docs", "evidence")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "realdata_closed_loop.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("wrote", path)
    if not (result["pass_marker"] and result["pass_cosine"] and result["pass_v2v"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
