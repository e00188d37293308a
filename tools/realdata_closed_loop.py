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
random-weights values; direction cosine > 0.8 after training.

V2V definition without the licensed pkls: vertex-indexed V2V between the
fitted synthetic-body mesh and the real GT SMPL mesh is dominated by the
topology mismatch, not by prediction quality (measured: ~60 cm for BOTH
random and trained weights — the artifact records it as `v2v_raw_*` for
honesty).  The meaningful end-to-end quantities the artifact gates on are
  * `v2v_oracle_*`: full 6890-vertex V2V between the eval-CLI's fitted mesh
    and the ORACLE fit — the same body model fitted by the same two-stage LM
    to the ground-truth marker positions.  Same topology, so per-vertex
    correspondence is exact; "trained fit converges to the oracle fit" is
    precisely the closed-loop claim (reference src/eval.py:234-238 measures
    the same convergence, against GT params instead of a GT fit, which
    requires the licensed body model).
  * `marker_v2v_*`: the fitted mesh's 86 marker vertices vs the real GT SMPL
    mesh's marker vertices — a cross-topology-valid absolute error against
    real ground truth, through the full CLI path (forward -> markers ->
    two-stage LM -> mesh).  This one has a FLOOR set by the smoke body's
    articulation limits (a straight-chain capsule cannot reach a human
    marker layout; measured ~30 cm, shared by the oracle fit), so it is
    recorded as evidence of direction-of-change, not ratio-gated.

The cosine gate is calibrated against the DATA's own resolution ceiling,
which the artifact records: the backbone encodes 512 FPS centers and
propagates features to all 5000 points by 3-NN IDW (reference
pointnet2_utils.py:45-74 does the same), so the predicted direction field
cannot vary faster than the ~10-points-per-center scale.  Replacing each
point's GT direction with the normalized mean GT direction of its k nearest
neighbors gives the best cosine any such field can score: 0.96 at k=3, 0.91
at k=10, 0.88 at k=20 on this sample.  A trained cosine of ~0.85 is near
that ceiling; the synthetic-capsule harness only reaches 0.99 because its
analytic GT field is smooth at the feature resolution.
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


def direction_ceiling(batch, ks=(3, 10, 20)):
    """Best mean cosine a direction field at the feature resolution can
    score: cosine between each point's GT direction and the normalized mean
    GT direction over its k nearest neighbors (see module docstring)."""
    pts, v = batch["hitpts"], batch["vectors"]
    gd = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    out = {}
    for k in ks:
        cs = []
        for b in range(pts.shape[0]):
            d2 = ((pts[b][:, None] - pts[b][None]) ** 2).sum(-1)
            idx = np.argpartition(d2, k, axis=1)[:, :k]
            m = gd[b][idx].mean(1)
            m /= np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-9)
            cs.append(float((m * gd[b]).sum(-1).mean()))
        out[f"k{k}"] = round(float(np.mean(cs)), 4)
    return out


def oracle_fit(markerset, gt_mk):
    """Fit the same synthetic body (same seed the eval CLI uses) to the GT
    marker positions with the same two-stage LM — the best mesh the eval
    path could ever produce.  Returns (verts (V,3) float32, vids (86,))."""
    import jax.numpy as jnp

    from etch_tpu.body.smpl import marker_submodel, smpl_forward
    from etch_tpu.fit.smpl_fit import fit_smpl_params
    from etch_tpu.pipeline import load_body_model

    body = load_body_model("neutral", root=REPO, allow_synthetic=True)
    vids = np.asarray(list(markerset.values()), np.int32)
    sub = marker_submodel(body, vids)
    markers = jnp.asarray(gt_mk[None])
    valid = jnp.ones(markers.shape[:2], bool)
    params = fit_smpl_params(sub, markers, valid)
    verts, _ = smpl_forward(
        body, params["betas"], params["pose"],
        params["global_orient"], params["transl"],
    )
    return np.asarray(verts[0], np.float32), vids


def fitted_mesh_verts(tag, workdir):
    """Vertices of the mesh the eval CLI exported for this run."""
    from etch_tpu.data.mesh import load_obj

    p = os.path.join(
        workdir, "all_experiments", "experiments",
        f"eval_outputs_closed_loop_{tag}", SAMPLE_ID,
        f"forwarded_smpl_mesh_on_pred_{SAMPLE_ID}.obj",
    )
    return load_obj(p).vertices.astype(np.float32)


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
    # gt_mk: (86, 3) shared across the batch (one scan, B samplings) or
    # (B, 86, 3) per-item (generalization harness: B different bodies)
    gt = gt_mk[None] if gt_mk.ndim == 2 else gt_mk
    err = np.linalg.norm(mk - gt, axis=-1)  # (B, 86)
    marker_err_cm = float(np.mean(err[valid]) * 100.0)
    return {
        "direction_cosine": round(cosine, 4),
        "magnitude_mae_m": round(mag_mae, 5),
        "label_acc": round(label_acc, 4),
        "marker_err_cm": round(marker_err_cm, 3),
        "markers_valid_frac": round(float(valid.mean()), 4),
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

    workdir = "/tmp/etch_closed_loop"
    os.makedirs(workdir, exist_ok=True)
    ckpt_dir = os.path.join(workdir, "ckpt")

    resume = os.environ.get("ETCH_CLOSED_LOOP_RESUME")
    if resume:
        # reuse an already-trained checkpoint (e.g. after editing only the
        # metric/gate code) instead of repeating the ~26 min TPU training
        from etch_tpu.train.checkpoint import restore_train_state

        state, step = restore_train_state(resume, state)
        # the eval CLI below loads from ckpt_dir — point it at the resumed
        # checkpoint so the "trained" V2V always matches the in-memory params
        ckpt_dir = resume
        train_s, loss_trace = 0.0, []
        prev = os.path.join(REPO, "docs", "evidence", "realdata_closed_loop.json")
        if os.path.isfile(prev):  # keep the original run's training record
            with open(prev) as f:
                p = json.load(f)
            train_s = p.get("train_seconds", 0.0)
            loss_trace = p.get("loss_trace", [])
        print(f"resumed step {step} from {resume}", flush=True)
    else:
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
        save_train_state(ckpt_dir, STEPS, state, cfg.to_json())

    after = metrics(model, state, batch, gt_mk, cfg)
    print("after:", json.dumps(after), flush=True)
    print("running eval CLI with random weights...", flush=True)
    v2v_raw_before = run_eval_cli("random", None, workdir)
    print("running eval CLI with the trained checkpoint...", flush=True)
    v2v_raw_after = run_eval_cli("trained", ckpt_dir, workdir)

    # meaningful V2V without the licensed pkls (module docstring): compare
    # the CLI-exported fitted meshes against the oracle fit (same topology)
    # and their 86 marker vertices against the real GT marker positions
    print("computing oracle fit...", flush=True)
    oracle_verts, vids = oracle_fit(markerset, gt_mk)
    fv = {t: fitted_mesh_verts(t, workdir) for t in ("random", "trained")}
    v2v_oracle = {
        t: float(np.mean(np.linalg.norm(v - oracle_verts, axis=1))) * 100.0
        for t, v in fv.items()
    }
    marker_v2v = {
        t: float(np.mean(np.linalg.norm(v[vids] - gt_mk, axis=1))) * 100.0
        for t, v in fv.items()
    }
    print(f"V2V vs oracle fit: random {v2v_oracle['random']:.3f} cm, "
          f"trained {v2v_oracle['trained']:.3f} cm", flush=True)
    print(f"marker V2V vs real GT: random {marker_v2v['random']:.3f} cm, "
          f"trained {marker_v2v['trained']:.3f} cm", flush=True)

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
        "v2v_oracle_cm_random": round(v2v_oracle["random"], 3),
        "v2v_oracle_cm_trained": round(v2v_oracle["trained"], 3),
        "marker_v2v_cm_random": round(marker_v2v["random"], 3),
        "marker_v2v_cm_trained": round(marker_v2v["trained"], 3),
        "v2v_raw_cm_random": round(v2v_raw_before, 3),
        "v2v_raw_cm_trained": round(v2v_raw_after, 3),
        "direction_cosine_ceiling": direction_ceiling(batch),
        "note": (
            "synthetic smoke-test body (real SMPL pkls are not "
            "redistributable): v2v_raw_* (vertex-indexed vs the real SMPL "
            "mesh) is dominated by the topology mismatch and recorded only "
            "for honesty; v2v_oracle_* is the same-topology V2V against the "
            "GT-marker oracle fit and marker_v2v_* the cross-topology-valid "
            "error vs real GT markers (module docstring). "
            "direction_cosine_ceiling: best cosine achievable by a field "
            "at the 512-center feature resolution (module docstring)."
        ),
        "pass_marker": after["marker_err_cm"] < 0.5 * before["marker_err_cm"],
        "pass_cosine": after["direction_cosine"] > 0.8,
        "pass_v2v": v2v_oracle["trained"] < 0.5 * v2v_oracle["random"],
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
