"""Statistical PnP parity vs. the cv2 oracle (the reference's solver).

The ADD(-S) parity claim rests on the on-device PnP matching
cv2.solvePnPRansac(EPnP)+solvePnP(ITERATIVE) within the metric envelope;
this test quantifies it over a population of noisy problems.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from casapose_tpu.pose.epnp import pose_matrix_from_p6d, solve_pnp

K = np.array([[572.4114, 0.0, 325.2611], [0.0, 573.57043, 242.04899], [0.0, 0.0, 1.0]], np.float64)


pytestmark = pytest.mark.slow

def _population(n, rng, noise):
    pts3d = rng.uniform(-0.06, 0.06, size=(n, 9, 3))
    R = Rotation.random(n, random_state=42).as_matrix()
    t = np.stack([rng.uniform(-0.15, 0.15, n), rng.uniform(-0.15, 0.15, n), rng.uniform(0.4, 1.5, n)], 1)
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = cam @ K.T
    pts2d = uv[..., :2] / uv[..., 2:]
    pts2d_noisy = pts2d + rng.normal(scale=noise, size=pts2d.shape)
    return pts3d, pts2d_noisy, R, t


def _cv2_solve(pts3d, pts2d):
    _, rvec0, t0, _ = cv2.solvePnPRansac(
        pts3d[None], pts2d[None], K, None, flags=cv2.SOLVEPNP_EPNP, confidence=0.9999, reprojectionError=12
    )
    _, rvec, t = cv2.solvePnP(
        pts3d, pts2d, K, None, flags=cv2.SOLVEPNP_ITERATIVE, useExtrinsicGuess=True, rvec=rvec0, tvec=t0
    )
    R, _ = cv2.Rodrigues(rvec)
    return R, t[:, 0]


def _reproj_rmse(pts3d, pts2d, R, t):
    cam = pts3d @ R.T + t
    uv = cam @ K.T
    proj = uv[:, :2] / uv[:, 2:]
    return float(np.sqrt(np.mean(np.sum((proj - pts2d) ** 2, -1))))


def test_population_parity_1px_noise():
    rng = np.random.default_rng(0)
    n = 100
    pts3d, pts2d, _, _ = _population(n, rng, noise=1.0)
    p6d = np.asarray(
        solve_pnp(jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32), jnp.asarray(K, jnp.float32),
                  iterations=15)
    )
    RT = np.asarray(pose_matrix_from_p6d(jnp.asarray(p6d)))
    t_diffs, rot_diffs, excess = [], [], []
    for i in range(n):
        R_cv, t_cv = _cv2_solve(pts3d[i], pts2d[i])
        t_diffs.append(np.linalg.norm(RT[i, :, 3] - t_cv))
        rot_diffs.append(np.abs(RT[i, :, :3] - R_cv).max())
        ours = _reproj_rmse(pts3d[i], pts2d[i], RT[i, :, :3].astype(np.float64), RT[i, :, 3].astype(np.float64))
        cv = _reproj_rmse(pts3d[i], pts2d[i], R_cv, t_cv)
        excess.append(ours - cv)
    t_diffs = np.array(t_diffs)
    excess = np.array(excess)
    # Both solvers find (nearly) the same least-squares optimum: the
    # residual objective must match cv2 to well under a milli-pixel, and
    # translations to sub-millimeter, for >= 97% of the population.
    assert np.quantile(np.abs(excess), 0.97) < 1e-3, np.sort(np.abs(excess))[-5:]
    assert np.quantile(t_diffs, 0.97) < 1e-3, np.sort(t_diffs)[-5:]
    assert np.median(t_diffs) < 2e-4


def test_population_parity_clean():
    rng = np.random.default_rng(1)
    n = 50
    pts3d, pts2d, R_gt, t_gt = _population(n, rng, noise=0.0)
    p6d = np.asarray(
        solve_pnp(jnp.asarray(pts2d, jnp.float32), jnp.asarray(pts3d, jnp.float32), jnp.asarray(K, jnp.float32))
    )
    RT = np.asarray(pose_matrix_from_p6d(jnp.asarray(p6d)))
    t_err = np.linalg.norm(RT[:, :, 3] - t_gt, axis=1)
    assert np.max(t_err) < 5e-4, np.sort(t_err)[-5:]
