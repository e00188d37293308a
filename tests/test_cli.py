"""CLI smoke tests on the bundled 4D-Dress sample (reference-parity entry
points: infer + evaluate end-to-end with a synthetic body model)."""

import os

import numpy as np
import pytest

REF = os.path.join(os.path.dirname(__file__), "..", "datafolder")
SCAN = f"{REF}/4D-DRESS/data_processed/model/00122_Inner_Take2_00011/00122_Inner_Take2_00011.obj"
MARKERS = f"{REF}/useful_data_4d-dress/superset_smpl.json"

def needs_sample(f):
    # assets are vendored in-repo: a missing sample is a bug, not a skip
    return f


@needs_sample
@pytest.mark.slow
def test_infer_cli(tmp_path):
    from etch_tpu.cli.infer import main

    out = str(tmp_path / "out")
    main([
        "--scan_path", SCAN,
        "--markerset_path", MARKERS,
        "--num_point", "256",
        "--output_folder", out,
        "--allow_synthetic_body",
    ])
    name = "00122_Inner_Take2_00011"
    assert os.path.exists(os.path.join(out, f"{name}_pred_smpl.obj"))
    d = np.load(os.path.join(out, f"{name}_output_smpl_info.npz"))
    # exact reference npz schema (inference_demo.py:121-127)
    assert d["body_pose"].shape == (21, 3)
    assert d["hand_pose"].shape == (2, 3)
    assert d["betas"].shape == (10,)
    assert d["global_orient"].shape == (3,)
    assert d["transl"].shape == (3,)
    assert d["joints"].shape == (45, 3)


@needs_sample
@pytest.mark.slow
def test_evaluate_cli(tmp_path, monkeypatch):
    from etch_tpu.cli.evaluate import main

    monkeypatch.chdir(tmp_path)
    main([
        "--scan_dir", f"{REF}/4D-DRESS/data_processed/model",
        "--smpl_dir", f"{REF}/4D-DRESS/data_processed/smplh",
        "--infopoints_dir", f"{REF}/gt_4D-Dress_data/npz",
        "--activated_ids_path", "",
        "--markerset_path", MARKERS,
        "--num_point", "256", "--batch_size", "1", "--num_workers", "0",
        "--allow_synthetic_body", "--i", "smoke", "--save_debug",
    ])
    root = tmp_path / "all_experiments/experiments/eval_outputs_smoke"
    score = root / "v2v_score.txt"
    assert score.exists()
    text = score.read_text()
    assert "average v2v:" in text
    sample_dir = root / "00122_Inner_Take2_00011"
    files = os.listdir(sample_dir)
    assert any(f.startswith("tightness_vectors_info") for f in files)
    assert any(f.startswith("output_smpl_info") for f in files)
    assert any(f.startswith("forwarded_smpl_mesh_on_pred") for f in files)
