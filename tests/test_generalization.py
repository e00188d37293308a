"""Held-out generalization evidence gate (VERDICT round-3 next #3).

Two layers, mirroring tests/test_overfit.py:

* `test_family_gt_pipeline_smoke` — the synthetic body family produces
  valid real-pipeline GT on CPU (raycast infopoints accepted, all 86
  labels populated, cloth-scale tightness vectors).
* `test_generalization_artifact` — the committed artifact from the full
  TPU run (`python tools/generalization_evidence.py`) must be present and
  passing.  A missing artifact FAILS (a skip would read as a pass in a -q
  run — VERDICT round-2 weak #4).
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_family_gt_pipeline_smoke(tmp_path):
    from tools.generalization_harness import build_items, marker_vertex_ids

    vids = marker_vertex_ids()
    assert len(vids) == 86 and len(set(vids)) == 86

    batch, gt_mk = build_items(str(tmp_path), [7], num_point=1024,
                               samplings=1, verbose=False)
    assert batch["hitpts"].shape == (1, 1024, 3)
    assert gt_mk.shape == (1, 86, 3)
    for k, v in batch.items():
        assert np.isfinite(np.asarray(v, np.float64)).all(), k
    # cloth-scale tightness vectors (the family's bump field is 0.8-5 cm)
    norms = np.linalg.norm(batch["vectors"][0], axis=-1)
    assert 0.005 < norms.mean() < 0.06, norms.mean()
    # geodesic labels cover (nearly) the full 86-marker set
    assert len(np.unique(batch["labels"])) > 70
    # infopoint raycast accepted a healthy fraction of the 30k samples
    info = np.load(tmp_path / "npz" / "synth_0007.npz")
    assert info["info_points"].shape[0] > 15000


def test_generalization_artifact():
    """The full-run evidence from the TPU must be present and passing."""
    path = os.path.join(REPO, "docs", "evidence", "generalization.json")
    assert os.path.isfile(path), (
        "docs/evidence/generalization.json is missing — run "
        "`python tools/generalization_evidence.py` on the TPU and commit "
        "the artifact (held-out generalization gate, VERDICT r3 next #3)"
    )
    with open(path) as f:
        r = json.load(f)

    assert r["config"]["eval_bodies"] >= 8
    assert r["config"]["train_bodies"] >= 8
    held = r["trained"]["heldout"]
    rnd = r["random"]["heldout"]
    # the model must LEARN, not memorize: held-out bodies it never saw.
    # Gates at ~70% of the round-4 achieved margins (VERDICT r4 next #3:
    # achieved cosine 0.988 / label acc 0.717 / marker err 0.13x random /
    # v2v-oracle 0.087x random) so a real regression trips them while
    # seed-level noise does not.
    assert held["direction_cosine"] > 0.9, held
    assert held["label_acc"] > 0.6, held
    assert held["marker_err_cm"] < 0.2 * rnd["marker_err_cm"], (held, rnd)
    assert held["v2v_oracle_cm"] < 0.35 * rnd["v2v_oracle_cm"], (held, rnd)
    assert all(r["gates"].values()), r["gates"]

    # learning curve (heldout vs train at 2-3 values of K_TRAIN): the next
    # regression shows as a curve shift, not only a gate flip
    curve = r["learning_curve"]
    assert len(curve) >= 2
    ks = [c["k_train"] for c in curve]
    assert ks == sorted(ks)
    # more training bodies must not make held-out labels much worse
    accs = [c["heldout"]["label_acc"] for c in curve]
    assert accs[-1] >= max(accs[:-1]) - 0.1, accs
