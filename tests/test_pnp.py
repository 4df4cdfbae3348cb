"""EPnP / Gauss-Newton / BPnP vs. cv2 oracle and synthetic ground truth."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from casapose_tpu.pose.bpnp import bpnp_pose
from casapose_tpu.pose.epnp import epnp, pose_matrix_from_p6d, solve_pnp

K = np.array([[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]], np.float32)


def make_problem(b, n, rng, noise=0.0):
    pts3d = rng.uniform(-0.06, 0.06, size=(b, n, 3)).astype(np.float32)
    axes = rng.normal(size=(b, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rvec = (axes * rng.uniform(0.1, 2.5, size=(b, 1))).astype(np.float32)
    t = np.stack(
        [rng.uniform(-0.1, 0.1, b), rng.uniform(-0.1, 0.1, b), rng.uniform(0.5, 1.2, b)], axis=1
    ).astype(np.float32)
    R = Rotation.from_rotvec(rvec).as_matrix().astype(np.float32)
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = cam @ K.T
    pts2d = uv[..., :2] / uv[..., 2:]
    if noise:
        pts2d = pts2d + rng.normal(scale=noise, size=pts2d.shape)
    return pts2d.astype(np.float32), pts3d, R, t, rvec


def reproj_err(pts2d, pts3d, K, R, t):
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = cam @ K.T
    proj = uv[..., :2] / uv[..., 2:]
    return np.linalg.norm(proj - pts2d, axis=-1).mean(axis=-1)


def test_epnp_exact_correspondences():
    rng = np.random.default_rng(0)
    pts2d, pts3d, R_gt, t_gt, _ = make_problem(16, 9, rng)
    R, t = epnp(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K))
    err = reproj_err(pts2d, pts3d, K, np.asarray(R), np.asarray(t))
    assert np.all(err < 1.0), err


@pytest.mark.slow
def test_solve_pnp_recovers_exact_pose():
    rng = np.random.default_rng(1)
    pts2d, pts3d, R_gt, t_gt, rvec_gt = make_problem(16, 9, rng)
    p6d = solve_pnp(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K))
    RT = np.asarray(pose_matrix_from_p6d(p6d))
    err = reproj_err(pts2d, pts3d, K, RT[:, :, :3], RT[:, :, 3])
    assert np.all(err < 1e-2), err
    np.testing.assert_allclose(RT[:, :, 3], t_gt, atol=1e-3)


@pytest.mark.slow
def test_solve_pnp_vs_cv2_noisy():
    """With 1px noise, our GN solution should match cv2's refined solution
    to sub-millimeter translation (both find the same LS optimum)."""
    rng = np.random.default_rng(2)
    pts2d, pts3d, _, _, _ = make_problem(8, 9, rng, noise=1.0)
    p6d = np.asarray(solve_pnp(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K), iterations=20))
    for i in range(8):
        _, rvec0, t0, _ = cv2.solvePnPRansac(
            pts3d[i].astype(np.float64)[None],
            pts2d[i].astype(np.float64)[None],
            K.astype(np.float64),
            None,
            flags=cv2.SOLVEPNP_EPNP,
            confidence=0.9999,
            reprojectionError=12,
        )
        _, rvec, t = cv2.solvePnP(
            pts3d[i].astype(np.float64),
            pts2d[i].astype(np.float64),
            K.astype(np.float64),
            None,
            flags=cv2.SOLVEPNP_ITERATIVE,
            useExtrinsicGuess=True,
            rvec=rvec0,
            tvec=t0,
        )
        R_cv, _ = cv2.Rodrigues(rvec)
        R_ours, _ = cv2.Rodrigues(p6d[i, 0:3].astype(np.float64))
        np.testing.assert_allclose(p6d[i, 3:6], t[:, 0], atol=2e-3)
        np.testing.assert_allclose(R_ours, R_cv, atol=5e-3)


def test_solve_pnp_zero_points_placeholder():
    rng = np.random.default_rng(3)
    _, pts3d, _, _, _ = make_problem(4, 9, rng)
    pts2d = np.zeros((4, 9, 2), np.float32)
    p6d = np.asarray(solve_pnp(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K)))
    assert np.all(np.isfinite(p6d))
    np.testing.assert_allclose(p6d, np.tile([0, 0, 0, 0, 0, 1.0], (4, 1)), atol=1e-6)


def test_bpnp_gradient_matches_finite_differences():
    rng = np.random.default_rng(4)
    pts2d, pts3d, _, _, _ = make_problem(2, 9, rng, noise=0.5)
    pts2d_j = jnp.asarray(pts2d)
    pts3d_j = jnp.asarray(pts3d)
    K_j = jnp.asarray(K)

    def scalar_fn(p2d):
        p6d = bpnp_pose(p2d, pts3d_j, K_j)
        return jnp.sum(p6d * jnp.asarray([1.0, -0.5, 0.3, 2.0, 1.0, -1.0]))

    g = np.asarray(jax.grad(scalar_fn)(pts2d_j))
    # Central finite differences on a few coordinates.
    eps = 0.05
    for (bi, ni, ci) in [(0, 0, 0), (0, 4, 1), (1, 8, 0)]:
        dp = pts2d.copy()
        dp[bi, ni, ci] += eps
        up = float(scalar_fn(jnp.asarray(dp)))
        dp[bi, ni, ci] -= 2 * eps
        down = float(scalar_fn(jnp.asarray(dp)))
        fd = (up - down) / (2 * eps)
        assert np.isfinite(g[bi, ni, ci])
        np.testing.assert_allclose(g[bi, ni, ci], fd, rtol=0.12, atol=5e-4)


@pytest.mark.slow
def test_bpnp_zero_rows_finite_gradients():
    rng = np.random.default_rng(5)
    pts2d, pts3d, _, _, _ = make_problem(3, 9, rng)
    pts2d[1] = 0.0  # missing object

    def scalar_fn(p2d):
        return jnp.sum(bpnp_pose(p2d, jnp.asarray(pts3d), jnp.asarray(K)))

    g = np.asarray(jax.grad(scalar_fn)(jnp.asarray(pts2d)))
    assert np.all(np.isfinite(g))
