"""RANSAC-path pose evaluation, poses_pnp, and ImageOnlyDataset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from scipy.spatial.transform import Rotation

from casapose_tpu.data.image_only import ImageOnlyDataset
from casapose_tpu.pose.evaluation import estimate_and_evaluate_poses, poses_pnp

K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]], np.float32)
H, W = 240, 320


def _scene(oc=2, vn=9, seed=0):
    """Synthetic seg + perfect direction fields for oc objects."""
    rng = np.random.default_rng(seed)
    kp3d = rng.uniform(-0.05, 0.05, (1, oc, 1, vn, 3)).astype(np.float32)
    poses_gt = np.zeros((1, oc, 1, 3, 4), np.float32)
    seg = np.zeros((1, H, W, 1 + oc), np.float32)
    seg[..., 0] = 1.0
    dirs = np.zeros((1, H, W, vn, 2), np.float32)
    cy, cx = np.mgrid[0:H, 0:W].astype(np.float32) + 0.5
    regions = [(slice(40, 110), slice(40, 130)), (slice(130, 210), slice(170, 290))]
    kp2d_all = np.zeros((1, oc, 1, vn, 2), np.float32)
    for o in range(oc):
        Rm = Rotation.random(random_state=seed * 10 + o).as_matrix().astype(np.float32)
        t = np.array([0.05 * (o - 0.5), 0.02, 0.6], np.float32)
        poses_gt[0, o, 0, :, :3] = Rm
        poses_gt[0, o, 0, :, 3] = t
        cam = kp3d[0, o, 0] @ Rm.T + t
        uv = cam @ K.T
        xy = uv[:, :2] / uv[:, 2:]
        kp2d_all[0, o, 0] = xy[:, ::-1]  # (y, x)
        ys, xs = regions[o]
        m = np.zeros((H, W), bool)
        m[ys, xs] = True
        seg[0, m, 0] = 0.0
        seg[0, m, o + 1] = 1.0
        for ki in range(vn):
            vy = xy[ki, 1] - cy
            vx = xy[ki, 0] - cx
            nrm = np.sqrt(vy**2 + vx**2) + 1e-9
            dirs[0, :, :, ki, 0] = np.where(m, vy / nrm, dirs[0, :, :, ki, 0])
            dirs[0, :, :, ki, 1] = np.where(m, vx / nrm, dirs[0, :, :, ki, 1])
    return seg, dirs, kp3d, poses_gt, kp2d_all


def test_estimate_and_evaluate_poses_ransac_path():
    oc, vn = 2, 9
    seg, dirs, kp3d, poses_gt, _ = _scene(oc, vn)
    offsets = np.array([[0, 0, H, W, 0, 0, 0, 1.0, W, H]], np.float32)
    diam = np.full((1, oc, 1, 1), 0.12, np.float32)
    stats, poses, points = estimate_and_evaluate_poses(
        jnp.asarray(seg * 50.0),
        jnp.asarray(seg),
        jnp.asarray(dirs.reshape(1, H, W, vn * 2)),
        jnp.asarray(poses_gt),
        jnp.asarray(kp3d),
        jnp.asarray(np.tile(K[None], (1, 1, 1))),
        jnp.asarray(diam),
        jnp.asarray(offsets),
        min_num=20,
        rng_key=jax.random.PRNGKey(0),
    )
    valid_3d = np.asarray(stats[1])
    np.testing.assert_array_equal(valid_3d, [1, 1])
    np.testing.assert_allclose(np.asarray(poses)[0], poses_gt[:, :, 0][0], atol=5e-3)
    assert float(np.asarray(stats[6]).sum()) == 0  # no missing


def test_poses_pnp_inference_path():
    oc, vn = 2, 9
    seg, dirs, kp3d, poses_gt, kp2d = _scene(oc, vn, seed=3)
    # voted points == GT projections, (y, x) order
    pts = jnp.asarray(kp2d[:, :, 0])  # [1, oc, vn, 2]
    poses = poses_pnp(pts, jnp.asarray(seg * 30.0), jnp.asarray(kp3d), jnp.asarray(K[None]), oc)
    np.testing.assert_allclose(np.asarray(poses)[0, :, 0], poses_gt[0, :, 0], atol=2e-3)


def test_image_only_dataset(tmp_path):
    d = tmp_path / "scene" / "rgb"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)).save(d / f"{i:06d}.png")
    ds = ImageOnlyDataset(str(tmp_path))
    assert len(ds) == 3
    stream, batches = ds.generate_dataset(batchsize=1)
    assert batches == 3
    imgs = list(stream)
    assert len(imgs) == 3
    assert imgs[0].shape == (1, 32, 48, 3)
    assert imgs[0].min() >= -1.0 and imgs[0].max() <= 1.0
