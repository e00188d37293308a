"""End-to-end pipeline smoke tests on a tiny config, including the bundled
4D-Dress sample scan (the reference's de-facto smoke fixture, README.md:54,98)
and the multi-chip dry run on the virtual CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etch_tpu.pipeline import build_pipeline, center_scan
from etch_tpu.utils.config import EtchConfig

SAMPLE_SCAN = os.path.join(
    os.path.dirname(__file__), "..", "datafolder",
    "4D-DRESS", "data_processed", "model",
    "00122_Inner_Take2_00011", "00122_Inner_Take2_00011.obj",
)

TINY_N = 256


def _markerset():
    return {f"M{i}": int(v) for i, v in enumerate(np.linspace(0, 299, 86).astype(int))}


# Building + compiling the full pipeline takes minutes on the 1-core CI
# host, so every test that touches the `pipe` fixture or the dryrun lives
# in the slow tier (see README "Test tiers").
@pytest.fixture(scope="module")
def pipe():
    cfg = EtchConfig(num_point=TINY_N)
    return build_pipeline(cfg, _markerset(), allow_synthetic_body=True)


@pytest.mark.slow
def test_predict_shapes_and_finiteness(pipe):
    rng = np.random.RandomState(0)
    z = rng.uniform(-0.9, 0.9, (1, TINY_N))
    th = rng.uniform(0, 2 * np.pi, (1, TINY_N))
    pts = np.stack(
        [0.15 * np.cos(th), 0.15 * np.sin(th), z], axis=-1
    ).astype(np.float32)
    out = pipe.predict(pts)
    assert out["vectors"].shape == (1, TINY_N, 3)
    assert out["part_labels"].shape == (1, TINY_N)
    assert out["confidences"].shape == (1, TINY_N, 1)
    dirs = np.asarray(out["direction"])
    np.testing.assert_allclose(
        np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-3
    )  # directions are rotations of a unit vector
    for k in ("vectors", "confidences", "inner_points"):
        assert np.isfinite(np.asarray(out[k])).all(), k


@pytest.mark.slow
def test_fit_outputs(pipe):
    rng = np.random.RandomState(1)
    inner = rng.randn(1, TINY_N, 3).astype(np.float32) * 0.2
    labels = jnp.asarray(rng.randint(0, 86, (1, TINY_N)))
    conf = jnp.asarray(rng.rand(1, TINY_N, 1).astype(np.float32))
    verts, params, markers, valid, joints = pipe.fit(
        jnp.asarray(inner), labels, conf
    )
    assert verts.shape[0] == 1 and verts.shape[2] == 3
    assert params["pose"].shape == (1, 69)
    assert params["betas"].shape == (1, 10)
    assert joints.shape == (1, 45, 3)
    assert np.isfinite(np.asarray(verts)).all()


@pytest.mark.slow
def test_bundled_sample_scan(pipe, tmp_path):
    result = pipe.run_scan(SAMPLE_SCAN, num_point=TINY_N, seed=16)
    assert result["vertices"].shape[1] == 3
    assert np.isfinite(result["vertices"]).all()
    # the fitted body must land in the scan's bbox neighborhood
    assert np.abs(result["vertices"].mean(0) - result["center"]).max() < 2.0

    obj_path, npz_path = pipe.export(result, SAMPLE_SCAN, str(tmp_path))
    assert os.path.exists(obj_path)
    data = np.load(npz_path)
    assert data["body_pose"].shape == (21, 3)
    assert data["hand_pose"].shape == (2, 3)
    assert data["betas"].shape == (10,)
    assert data["global_orient"].shape == (3,)
    assert data["transl"].shape == (3,)
    assert data["joints"].shape == (45, 3)


def test_center_scan_roundtrip():
    from etch_tpu.data.mesh import TriMesh

    v = np.array([[0.0, 0, 0], [2, 0, 0], [0, 4, 0]])
    mesh = TriMesh(v, np.array([[0, 1, 2]]))
    centered, center = center_scan(mesh)
    np.testing.assert_allclose(center, [1.0, 2.0, 0.0])
    vmin, vmax = centered.bounds()
    np.testing.assert_allclose(vmin + vmax, 0.0, atol=1e-12)


@pytest.mark.slow
def test_dryrun_multichip_cpu_mesh():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_run_batch_matches_split_path(pipe):
    """The fused serving step must agree with predict()+fit()."""
    rng = np.random.RandomState(2)
    z = rng.uniform(-0.9, 0.9, (1, TINY_N))
    th = rng.uniform(0, 2 * np.pi, (1, TINY_N))
    pts = np.stack(
        [0.15 * np.cos(th), 0.15 * np.sin(th), z], axis=-1
    ).astype(np.float32)
    out = pipe.run_batch(pts)
    pred = pipe.predict(pts)
    verts, params, markers, valid, joints = pipe.fit(
        pred["inner_points"], pred["part_labels"], pred["confidences"])
    np.testing.assert_allclose(np.asarray(out["markers"]),
                               np.asarray(markers), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               np.asarray(verts), rtol=1e-4, atol=1e-4)
