"""Visual-report writers: pose comparison, proxy-error dumps (dataset_utils
parity surface, VERDICT round-1 item 9)."""

import os

import numpy as np

from casapose_tpu.utils.visualization import (
    proxy_error_grayscale,
    save_mask_by_proxy_loss,
    save_pose_comparison,
    save_proxy_error_maps,
)


def _scene(oc=2, k=9):
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (64, 80, 3)).astype(np.float32)
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]])
    gt = np.zeros((oc, 1, 3, 4), np.float32)
    est = np.zeros((oc, 3, 4), np.float32)
    for o in range(oc):
        gt[o, 0, :, :3] = np.eye(3)
        gt[o, 0, :, 3] = [0.01 * o, 0.0, 0.5]
        est[o, :, :3] = np.eye(3)
        est[o, :, 3] = [0.01 * o + 0.005, 0.002, 0.5]
    cuboids = rng.uniform(-0.03, 0.03, (oc, 1, 8, 3)).astype(np.float32)
    keypoints = rng.uniform(-0.02, 0.02, (oc, 1, k, 3)).astype(np.float32)
    offsets = np.array([0, 0, 64, 80, 0, 0, 0, 1, 80, 64], np.float32)
    return img, est, gt, cuboids, keypoints, K, offsets


def test_save_pose_comparison_writes_both_images(tmp_path):
    img, est, gt, cub, kps, K, off = _scene()
    save_pose_comparison(img, est, gt, cub, kps, K, off, str(tmp_path), add_correct=np.array([1, 0]))
    assert os.path.exists(tmp_path / "cuboids.png")
    assert os.path.exists(tmp_path / "reprojected_keypoints.png")


def test_save_pose_comparison_split_by_correct(tmp_path):
    img, est, gt, cub, kps, K, off = _scene()
    save_pose_comparison(
        img, est, gt, cub, kps, K, off, str(tmp_path), add_correct=np.array([1, 0]), split_by_no_correct=True
    )
    assert os.path.exists(tmp_path / "1_correct" / "cuboids.png")


def test_save_pose_comparison_skips_invalid_poses(tmp_path):
    img, est, gt, cub, kps, K, off = _scene()
    est[:] = 0.0  # zero-pose convention = missed
    gt[1] = 0.0
    save_pose_comparison(img, est, gt, cub, kps, K, off, str(tmp_path))
    assert os.path.exists(tmp_path / "cuboids.png")


def test_proxy_error_grayscale_semantics():
    dist = np.array([[0.0, 15.0], [30.0, 7.5]])
    labels = np.array([[1, 1], [0, 2]])
    out = proxy_error_grayscale(dist, labels, clip_max=15.0)
    assert out[0, 0].tolist() == [255, 255, 255]  # zero error -> white
    assert out[0, 1].tolist() == [0, 0, 0]  # clip_max error -> black
    assert out[1, 0].tolist() == [0, 0, 0]  # background zeroed
    assert out[1, 1, 0] == 255 - int(7.5 / 15 * 255)


def test_save_proxy_maps_and_summary(tmp_path):
    rng = np.random.default_rng(1)
    dist = rng.uniform(0, 20, (32, 32, 9)).astype(np.float32)
    seg = np.zeros((32, 32, 3), np.float32)
    seg[..., 0] = 1.0
    seg[4:12, 4:12] = [0, 1, 0]
    seg[20:30, 20:30] = [0, 0, 1]
    save_proxy_error_maps(dist, seg, str(tmp_path), no_features=9)
    for i in range(9):
        assert os.path.exists(tmp_path / f"proxy_error_{i}.png")
    save_mask_by_proxy_loss(np.array([2.0, 9.0]), seg, str(tmp_path))
    from PIL import Image

    m = np.asarray(Image.open(tmp_path / "proxy_summary.png"))
    assert m[8, 8] == 255  # ok object
    assert m[25, 25] == 125  # high-proxy object
    assert m[0, 0] == 0  # background
