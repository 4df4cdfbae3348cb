"""Geometry primitives vs. scipy/cv2 oracles and analytic cases."""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from casapose_tpu.pose import geometry as geo


def random_rvecs(n, rng, max_angle=np.pi - 0.05):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0.01, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_rodrigues_matches_scipy():
    rng = np.random.default_rng(0)
    rvecs = random_rvecs(32, rng)
    R = np.asarray(geo.rodrigues(rvecs))
    R_ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rodrigues_zero_angle_is_identity():
    R = np.asarray(geo.rodrigues(np.zeros((3, 3), np.float32)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-7)


def test_rotation_to_rvec_roundtrip():
    rng = np.random.default_rng(1)
    rvecs = random_rvecs(64, rng)
    R = Rotation.from_rotvec(rvecs).as_matrix().astype(np.float32)
    out = np.asarray(geo.rotation_to_rvec(R))
    R2 = Rotation.from_rotvec(out).as_matrix()
    np.testing.assert_allclose(R2, R, atol=2e-4)


def test_rotation_to_rvec_near_pi():
    rng = np.random.default_rng(2)
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rvecs = (axes * (np.pi - 1e-4)).astype(np.float64)
    R = Rotation.from_rotvec(rvecs).as_matrix()
    out = np.asarray(geo.rotation_to_rvec(R))
    R2 = Rotation.from_rotvec(out).as_matrix()
    np.testing.assert_allclose(R2, R, atol=1e-3)


def test_project_batch_matches_numpy():
    rng = np.random.default_rng(3)
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)
    xyz = rng.normal(size=(4, 9, 3)).astype(np.float32) * 0.1
    RT = np.zeros((4, 3, 4), np.float32)
    RT[:, :, :3] = Rotation.from_rotvec(random_rvecs(4, rng)).as_matrix()
    RT[:, :, 3] = [0.1, -0.1, 1.5]
    xy, cam = geo.project_batch(xyz, K, RT)
    for i in range(4):
        xy_ref, cam_ref = geo.project_np(xyz[i], K, RT[i])
        np.testing.assert_allclose(np.asarray(xy)[i], xy_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(cam)[i], cam_ref, rtol=1e-4, atol=1e-5)


def test_transform_points_back_inverts_apply_offsets():
    rng = np.random.default_rng(4)
    # offsets layout: [h_crop, w_crop, out_h, out_w, dx, dy, angle, scale, orig_w, orig_h]
    offsets = np.array([20.0, 30.0, 448, 448, 5.0, -7.0, 10.0, 448.0 / 480.0, 640.0, 480.0], np.float32)
    pts_orig = rng.uniform(50, 400, size=(9, 2)).astype(np.float32)
    pts_aug = geo.apply_offsets_np(pts_orig, offsets).astype(np.float32)

    off = offsets[None]
    out = geo.transform_points_back_batch(
        pts_aug[None],
        off[:, 0:1],
        off[:, 1:2],
        off[:, 8:9],
        off[:, 9:10],
        off[:, 4:5],
        off[:, 5:6],
        off[:, 6:7],
        off[:, 7:8],
    )
    np.testing.assert_allclose(np.asarray(out)[0], pts_orig, atol=1e-2)


def test_quaternion_matrix_matches_cv2_rodrigues():
    rng = np.random.default_rng(5)
    for _ in range(8):
        rvec = random_rvecs(1, rng)[0].astype(np.float64)
        R_ref, _ = cv2.Rodrigues(rvec)
        q = Rotation.from_matrix(R_ref).as_quat()  # xyzw
        R = geo.quaternion_matrix_np(q)
        np.testing.assert_allclose(R, R_ref, atol=1e-8)
        t = np.array([1.0, 2.0, 3.0])
        Rt = geo.quaternion_matrix_np(q, translation=t)
        assert Rt.shape == (3, 4)
        np.testing.assert_allclose(Rt[:, 3], t)


def test_matrix_to_quaternion_roundtrip():
    rng = np.random.default_rng(6)
    R = Rotation.from_rotvec(random_rvecs(1, rng)[0]).as_matrix()
    q = geo.matrix_to_quaternion_np(R)
    R2 = geo.quaternion_matrix_np(q)
    np.testing.assert_allclose(R2, R, atol=1e-8)


@pytest.mark.parametrize("angle", [0.0, 15.0, -33.0])
def test_rotation_matrix_2d_matches_np(angle):
    import jax.numpy as jnp

    ref = geo.get_rotation_matrix_2D_np((320.0, 240.0), angle)
    out = geo.rotation_matrix_2d(jnp.float32(320.0), jnp.float32(240.0), jnp.float32(angle))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
