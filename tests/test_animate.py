"""Tests for the animation subsystem (skin-weight transfer + reposing)."""

import numpy as np
import jax.numpy as jnp

from etch_tpu.animate import (
    blend_transforms,
    clean_mesh,
    filter_mesh,
    inpaint_weights,
    repose_vertices,
    weights_transfer,
)
from etch_tpu.body.smpl import smpl_forward, synthetic_body_model
from etch_tpu.data.mesh import TriMesh


def test_clean_mesh_removes_degenerates():
    v = np.random.RandomState(0).randn(6, 3)
    f = np.array([[0, 1, 2], [1, 1, 2], [0, 1, 2], [3, 4, 5]])
    out = clean_mesh(TriMesh(v, f))
    assert len(out.faces) == 2          # degenerate + duplicate removed
    assert len(out.vertices) == 6


def test_repose_identity_is_noop():
    body = synthetic_body_model()
    zero = jnp.zeros((1, 69)), jnp.zeros((1, 3))
    A = blend_transforms(body, jnp.zeros((1, 10)), zero[0], zero[1])[0]
    rng = np.random.RandomState(1)
    verts = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    w = rng.rand(50, 24).astype(np.float32)
    w = jnp.asarray(w / w.sum(1, keepdims=True))
    out = repose_vertices(verts, w, A, A)
    np.testing.assert_allclose(np.asarray(out), np.asarray(verts), atol=1e-5)


def test_repose_follows_smpl_vertices():
    """Skinning the SMPL rest vertices with SMPL's own weights through
    (rest -> new pose) must reproduce smpl_forward's vertices."""
    body = synthetic_body_model()
    rng = np.random.RandomState(2)
    betas = jnp.zeros((1, 10))
    pose_new = jnp.asarray(rng.randn(1, 69).astype(np.float32) * 0.1)
    orient = jnp.zeros((1, 3))

    A_rest = blend_transforms(body, betas, jnp.zeros((1, 69)), orient)[0]
    A_new = blend_transforms(body, betas, pose_new, orient)[0]
    verts_rest, _ = smpl_forward(body, betas, jnp.zeros((1, 69)), orient, jnp.zeros((1, 3)))
    verts_new, _ = smpl_forward(body, betas, pose_new, orient, jnp.zeros((1, 3)))

    out = repose_vertices(
        verts_rest[0], body.lbs_weights, A_rest, A_new
    )
    # pure LBS reposing cannot reproduce the pose-corrective blendshapes
    # (synthetic posedirs are ~1e-4), same structural limitation as the
    # reference's animate pipeline
    np.testing.assert_allclose(np.asarray(out), np.asarray(verts_new[0]), atol=1e-3)


def test_weights_transfer_on_self_is_identityish():
    """Transferring weights from a mesh onto (a copy of) itself returns the
    original weights at matched vertices."""
    body = synthetic_body_model()
    mesh = TriMesh(np.asarray(body.v_template, np.float64), body.faces)
    w = np.asarray(body.lbs_weights)
    out = weights_transfer(mesh, mesh, w)
    # rows sum to one and correlate strongly with the originals
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-6)
    corr = (out * w).sum() / np.sqrt((out**2).sum() * (w**2).sum())
    assert corr > 0.99


def test_inpaint_weights_smooth_fill():
    # a strip mesh where the middle vertex is unmatched
    v = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0], [1, 1, 0], [2, 1, 0]], float)
    f = np.array([[0, 1, 4], [0, 4, 3], [1, 2, 5], [1, 5, 4]])
    mesh = TriMesh(v, f)
    w = np.array([[1, 0], [0.0, 0], [0, 1], [1, 0], [0.5, 0.5], [0, 1]], float)
    matched = np.array([True, False, True, True, True, True])
    out = inpaint_weights(mesh, w, matched)
    assert np.isfinite(out).all()
    assert 0 < out[1, 0] < 1 and 0 < out[1, 1] < 1  # interpolated between


def test_filter_mesh_drops_stretched_faces():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 0]], float)
    f = np.array([[0, 1, 2], [1, 2, 3]])
    raw = TriMesh(v, f)
    v2 = v.copy()
    v2[3] = [20, 20, 0]  # stretches face 1 far beyond the 2x edge bound
    new = TriMesh(v2, f)
    out = filter_mesh(new, raw)
    assert len(out.faces) == 1
