"""End-to-end GT data pipeline test on the bundled 4D-Dress sample
(the reference's de-facto fixture) plus unit tests for epn extras."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REF = os.path.join(os.path.dirname(__file__), "..", "datafolder")


@pytest.mark.slow
def test_load_item_on_bundled_sample():
    import json

    from etch_tpu.data.dataset import DatasetPaths, load_item

    with open(
        f"{REF}/useful_data_4d-dress/superset_smpl.json"
    ) as f:
        markerset = json.load(f)

    paths = DatasetPaths(
        scan_dir=f"{REF}/4D-DRESS/data_processed/model",
        smpl_dir=f"{REF}/4D-DRESS/data_processed/smplh",
        infopoints_dir=f"{REF}/gt_4D-Dress_data/npz",
    )
    item = load_item(
        paths, "00122_Inner_Take2_00011", num_point=512,
        marker_vertex_ids=list(markerset.values()), seed=1,
    )
    assert item["hitpts"].shape == (512, 3)
    assert item["vectors"].shape == (512, 3)
    assert item["confidences"].shape == (512, 1)
    assert item["labels"].shape == (512,)
    assert item["gender"] in ("male", "female", "neutral")
    # tightness magnitudes are centimeter-scale (cloth-body distances)
    mags = np.linalg.norm(item["vectors"], axis=1)
    assert mags.max() < 0.5 and np.median(mags) < 0.1
    # confidences in (0, 1], labels in range
    assert (item["confidences"] > 0).all() and (item["confidences"] <= 1).all()
    assert item["labels"].min() >= 0 and item["labels"].max() < 86
    # most sampled points should be within 1cm of an infopoint or the body
    assert np.isfinite(item["vectors"]).all()


def test_pointnet_so3_conv_shapes():
    from etch_tpu.nn.epn import PointnetSO3Conv, SphericalCloud

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 32, 60, 16).astype(np.float32))
    m = PointnetSO3Conv(dim_in=16, dim_out=24)
    p = m.init(jax.random.PRNGKey(0), SphericalCloud(xyz, feats))
    out = m.apply(p, SphericalCloud(xyz, feats))
    assert out.shape == (2, 60, 24)  # pooled over points
    out2 = m.apply(p, SphericalCloud(xyz, feats), pool_anchors=True)
    assert out2.shape == (2, 32, 24)


def test_rand_rotation_uniformity():
    from etch_tpu.geometry.augment import rand_rotation_matrix

    rng = np.random.default_rng(0)
    Rs = np.stack([rand_rotation_matrix(rng) for _ in range(200)])
    assert np.allclose(
        np.einsum("nij,nkj->nik", Rs, Rs), np.eye(3)[None], atol=1e-8
    )
    assert np.allclose(np.linalg.det(Rs), 1.0, atol=1e-8)
    # mean direction of rotated unit-z should be near zero (uniform cover)
    z = Rs @ np.array([0.0, 0, 1])
    assert np.abs(z.mean(axis=0)).max() < 0.15
