"""Tests for the icosahedral anchor group.

Verifies the mathematical properties the EPN backbone relies on (the reference
gets these implicitly from its ply-based construction,
external/vgtk/vgtk/functional/rotation.py:118-344):
  - 60 valid rotations forming a closed group containing identity
  - anchors permute the 20 face normals
  - intra adjacency is right-multiplication => left-action equivariant
"""

import numpy as np

from etch_tpu.geometry import (
    anchor_permutation,
    get_anchors,
    get_face_normals,
    get_intra_idx,
)


def test_anchor_shapes_and_validity():
    A = get_anchors()
    assert A.shape == (60, 3, 3)
    eye = np.einsum("aij,akj->aik", A, A)
    assert np.abs(eye - np.eye(3)).max() < 1e-5
    assert np.allclose(np.linalg.det(A), 1.0, atol=1e-5)
    assert get_anchors(1).shape == (1, 3, 3)
    assert get_anchors(20).shape == (20, 3, 3)


def test_identity_in_group():
    A = get_anchors()
    d = np.abs(A - np.eye(3)).max(axis=(1, 2))
    assert d.min() < 1e-6


def test_group_closure():
    A = get_anchors().astype(np.float64)
    prod = np.einsum("aij,bjk->abik", A, A)  # (60, 60, 3, 3)
    diff = np.abs(prod[:, :, None] - A[None, None]).max(axis=(-1, -2))
    assert diff.min(axis=2).max() < 1e-5


def test_unique_elements():
    A = get_anchors()
    diff = np.abs(A[:, None] - A[None]).max(axis=(-1, -2))
    np.fill_diagonal(diff, 1.0)
    assert diff.min() > 1e-3


def test_intra_idx_shape_and_identity_column():
    idx = get_intra_idx()
    assert idx.shape == (60, 12)
    # the identity multiplier maps each anchor to itself, so one column of
    # intra_idx must be arange(60)
    has_self = ((idx == np.arange(60)[:, None]).sum(axis=1) == 1).all()
    assert has_self


def test_intra_equivariance():
    """Left action by any group element permutes rows of intra_idx consistently:
    intra_idx[perm[a], j] == perm[intra_idx[a, j]]."""
    A = get_anchors()
    idx = get_intra_idx()
    rng = np.random.RandomState(0)
    for g in rng.choice(60, size=8, replace=False):
        perm = anchor_permutation(A[g])
        assert (idx[perm] == perm[idx]).all()


def test_anchors_permute_face_normals():
    A = get_anchors().astype(np.float64)
    N = get_face_normals().astype(np.float64)
    mapped = np.einsum("aij,fj->afi", A, N)
    sims = np.einsum("afi,gi->afg", mapped, N).max(axis=2)
    assert sims.min() > 1 - 1e-6
