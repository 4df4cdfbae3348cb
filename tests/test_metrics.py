"""ADD / ADD-S / 2D metrics and eval orchestration."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from casapose_tpu.pose.evaluation import estimate_poses, evaluate_pose_estimates
from casapose_tpu.pose.metrics import evaluate_poses

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)


def _setup(b=2, oc=3, V=50):
    rng = np.random.default_rng(0)
    ic = 1
    pts = rng.uniform(-0.05, 0.05, (b, oc, ic, V, 3)).astype(np.float32)
    counts = np.full((b, oc, ic), V, np.int32)
    poses_gt = np.zeros((b, oc, ic, 3, 4), np.float32)
    for bi in range(b):
        for o in range(oc):
            poses_gt[bi, o, 0, :, :3] = Rotation.random(random_state=int(rng.integers(1e6))).as_matrix()
            poses_gt[bi, o, 0, :, 3] = [0.05, -0.02, 0.9]
    diam = np.full((b, oc, ic, 1), 0.1, np.float32)
    cams = np.tile(K[None], (b, 1, 1))
    filt = np.ones((b, oc), np.int32)
    return pts, counts, poses_gt, diam, cams, filt


def test_perfect_pose_is_valid():
    pts, counts, poses_gt, diam, cams, filt = _setup()
    poses = poses_gt[:, :, 0]
    dummy_pts2d = np.ones((2, 3, 9, 2), np.float32)
    err2d, err3d, v2d, v3d, missing, cnt, fp = [
        np.asarray(x)
        for x in evaluate_poses(
            jnp.asarray(poses), jnp.asarray(poses_gt), jnp.asarray(dummy_pts2d), jnp.asarray(pts),
            jnp.asarray(counts), jnp.asarray(cams), jnp.asarray(diam), jnp.asarray(filt), 5.0,
        )
    ]
    np.testing.assert_allclose(err2d, 0.0, atol=1e-3)
    np.testing.assert_allclose(err3d, 0.0, atol=1e-5)
    np.testing.assert_array_equal(v3d, [2, 2, 2])
    np.testing.assert_array_equal(v2d, [2, 2, 2])
    np.testing.assert_array_equal(missing, 0)
    np.testing.assert_array_equal(fp, 0)
    np.testing.assert_array_equal(cnt, [2, 2, 2])


def test_missing_and_false_positive_bookkeeping():
    pts, counts, poses_gt, diam, cams, filt = _setup()
    poses = poses_gt[:, :, 0].copy()
    poses[0, 0] = 0.0  # missed detection
    filt = filt.copy()
    filt[1, 1] = 0  # GT absent but pose produced -> false positive
    err2d, err3d, v2d, v3d, missing, cnt, fp = [
        np.asarray(x)
        for x in evaluate_poses(
            jnp.asarray(poses), jnp.asarray(poses_gt), jnp.zeros((2, 3, 9, 2), jnp.float32), jnp.asarray(pts),
            jnp.asarray(counts), jnp.asarray(cams), jnp.asarray(diam), jnp.asarray(filt), 5.0,
        )
    ]
    assert missing[0] == 1
    assert fp[1] == 1
    # sentinel errors added for the missing object
    np.testing.assert_allclose(err2d[0], 99.9, atol=1e-3)
    np.testing.assert_allclose(err3d[0], 999.9, atol=1e-2)
    np.testing.assert_array_equal(cnt, [2, 1, 2])


def test_adds_symmetric_rotation_still_valid():
    """A 180-degree-rotated symmetric object fails ADD but passes ADD-S."""
    rng = np.random.default_rng(1)
    V = 7862  # symmetric by the reference's vertex-count convention
    b, oc, ic = 1, 1, 1
    # Ring of points, symmetric under 180deg rotation about z.
    theta = rng.uniform(0, 2 * np.pi, V)
    pts = np.stack([0.05 * np.cos(theta), 0.05 * np.sin(theta), np.zeros(V)], -1).astype(np.float32)
    pts = pts[None, None, None]
    counts = np.full((b, oc, ic), V, np.int32)
    poses_gt = np.zeros((b, oc, ic, 3, 4), np.float32)
    poses_gt[..., :3, :3] = np.eye(3)
    poses_gt[..., 2, 3] = 0.9
    Rz = Rotation.from_euler("z", 180, degrees=True).as_matrix().astype(np.float32)
    poses = poses_gt[:, :, 0].copy()
    poses[0, 0, :, :3] = Rz
    diam = np.full((b, oc, ic, 1), 0.1, np.float32)
    cams = K[None]
    filt = np.ones((b, oc), np.int32)
    _, err3d, _, v3d, _, _, _ = [
        np.asarray(x)
        for x in evaluate_poses(
            jnp.asarray(poses), jnp.asarray(poses_gt), jnp.zeros((1, 1, 9, 2), jnp.float32), jnp.asarray(pts),
            jnp.asarray(counts), jnp.asarray(cams), jnp.asarray(diam), jnp.asarray(filt), 5.0,
        )
    ]
    assert err3d[0] < 0.005  # closest-point distance on a dense ring
    assert v3d[0] == 1


def test_estimate_poses_roundtrip():
    """Voted 2D points from a known pose -> estimate_poses recovers it."""
    rng = np.random.default_rng(2)
    b, oc, ic, vn = 1, 2, 1, 9
    kp3d = rng.uniform(-0.05, 0.05, (b, oc, ic, vn, 3)).astype(np.float32)
    poses_gt = np.zeros((b, oc, ic, 3, 4), np.float32)
    for o in range(oc):
        poses_gt[0, o, 0, :, :3] = Rotation.random(random_state=o + 7).as_matrix()
        poses_gt[0, o, 0, :, 3] = [0.02, 0.01, 0.85]
    cam_pts = np.einsum("bocij,bocvj->bocvi", poses_gt[..., :3], kp3d) + poses_gt[..., None, :, 3]
    uv = cam_pts @ K.T
    xy = uv[..., :2] / uv[..., 2:]  # [b, oc, ic, vn, 2]
    offsets = np.array([[0, 0, 480, 640, 0, 0, 0, 1.0, 640, 480]], np.float32)
    filt = np.ones((b, oc), np.int32)
    poses, fp = estimate_poses(
        jnp.asarray(xy[:, :, 0]), jnp.asarray(kp3d), jnp.asarray(K[None]), jnp.asarray(filt), jnp.asarray(offsets)
    )
    np.testing.assert_allclose(np.asarray(poses), poses_gt[:, :, 0], atol=2e-3)
    np.testing.assert_array_equal(np.asarray(fp), 0)


def test_evaluate_pose_estimates_wrapper():
    pts, counts, poses_gt, diam, cams, filt = _setup(b=1, oc=2, V=30)
    b, oc = 1, 2
    h = w = 64
    target_seg = np.zeros((b, h, w, 1 + oc), np.float32)
    target_seg[..., 0] = 1
    target_seg[0, 5:30, 5:30] = [0, 1, 0]
    target_seg[0, 35:60, 35:60] = [0, 0, 1]
    stats, poses, pts2d = evaluate_pose_estimates(
        jnp.zeros((b, oc, 9, 2), jnp.float32),
        jnp.asarray(poses_gt),  # [b,oc,ic,3,4] — poses incl. instance axis
        jnp.asarray(poses_gt),
        jnp.asarray(target_seg),
        jnp.asarray(pts[:1, :2]),
        jnp.asarray(cams[:1]),
        jnp.asarray(diam[:1, :2]),
    )
    v2d, v3d = np.asarray(stats[0]), np.asarray(stats[1])
    np.testing.assert_array_equal(v3d, [1, 1])
    np.testing.assert_array_equal(np.asarray(stats[6]), 0)  # no missing
