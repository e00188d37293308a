"""Tests for SO(3) utilities (rotation conversions, chordal mean)."""

import numpy as np
from scipy.spatial.transform import Rotation as sciR

from etch_tpu.geometry.so3 import (
    matrix_to_quaternion,
    project_to_so3,
    project_to_so3_svd,
    quaternion_to_matrix,
    rodrigues,
    rotation_6d_to_matrix,
    rotation_matrix_to_axis_angle,
    so3_mean,
)


def _rand_rots(n, seed=0):
    return sciR.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_rodrigues_matches_scipy():
    rng = np.random.RandomState(0)
    aa = rng.randn(32, 3).astype(np.float32)
    R = np.asarray(rodrigues(aa))
    Rref = sciR.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(R, Rref, atol=1e-5)


def test_rodrigues_zero_and_gradients():
    import jax

    aa = np.zeros((2, 3), dtype=np.float32)
    R = np.asarray(rodrigues(aa))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)
    # Jacobian at zero must be finite (LM starts from zero pose)
    J = jax.jacobian(lambda a: rodrigues(a))(np.zeros(3, dtype=np.float32))
    assert np.isfinite(np.asarray(J)).all()


def test_axis_angle_roundtrip():
    rng = np.random.RandomState(1)
    aa = rng.randn(16, 3).astype(np.float32) * 0.8
    back = np.asarray(rotation_matrix_to_axis_angle(rodrigues(aa)))
    np.testing.assert_allclose(back, aa, atol=1e-4)


def test_quaternion_roundtrip():
    R = _rand_rots(16)
    q = np.asarray(matrix_to_quaternion(R))
    R2 = np.asarray(quaternion_to_matrix(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_rotation_6d():
    R = _rand_rots(8)
    d6 = np.concatenate([R[:, 0], R[:, 1]], axis=-1)
    R2 = np.asarray(rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_project_to_so3_is_rotation():
    rng = np.random.RandomState(2)
    C = rng.randn(20, 3, 3).astype(np.float32)
    R = np.asarray(project_to_so3(C))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_davenport_matches_svd_projection():
    """The quaternion (Davenport) projection equals the SVD-with-det-fix
    projection for generic matrices, including det<0 cases."""
    rng = np.random.RandomState(7)
    C = rng.randn(64, 3, 3).astype(np.float32)
    # make some det-negative entries explicit
    C[:8, :, 2] *= -1.0
    Rq = np.asarray(project_to_so3(C))
    Rs = np.asarray(project_to_so3_svd(C))
    np.testing.assert_allclose(Rq, Rs, atol=2e-4)


def test_so3_mean_recovers_common_rotation():
    """Mean of slightly-perturbed copies of R is ~R."""
    R = _rand_rots(1)[0]
    perturb = sciR.from_rotvec(
        np.random.RandomState(3).randn(10, 3) * 0.05
    ).as_matrix()
    Rs = np.einsum("nij,jk->nik", perturb, R)[None].astype(np.float32)
    m = np.asarray(so3_mean(Rs))[0]
    np.testing.assert_allclose(m, R, atol=0.05)


def test_so3_mean_weighted():
    """With a one-hot weight the mean equals the selected rotation."""
    Rs = _rand_rots(5)[None]
    w = np.array([[0.0, 0, 10.0, 0, 0]], dtype=np.float32)
    m = np.asarray(so3_mean(Rs, w))[0]
    np.testing.assert_allclose(m, Rs[0, 2], atol=1e-4)
