"""Pose estimation + evaluation orchestrators (eval-path glue).

Rebuild of casapose/pose_estimation/pose_evaluation.py and the
``estimate_poses`` driver (ransac_voting.py:488-558). The reference maps a
host cv2-PnP over every detection; here the whole batch of detections is
solved by one on-device ``solve_pnp`` call.
"""

from typing import Optional

import jax.numpy as jnp

from casapose_tpu.pose.epnp import pose_matrix_from_p6d, solve_pnp
from casapose_tpu.pose.geometry import rodrigues, transform_points_back_batch
from casapose_tpu.pose.metrics import evaluate_poses
from casapose_tpu.pose.ransac import ransac_voting_layer_all_masks


def _tile_eval_points(evaluation_points, object_points_3d_count, b, ic):
    """[oc, V, 3] + [oc, 1] -> batched [b, oc, ic, V, 3] / [b, oc, ic]."""
    pts = jnp.tile(evaluation_points[None, :, None], (b, 1, ic, 1, 1))
    cnt = jnp.tile(object_points_3d_count[None, :, :], (b, 1, ic))
    return pts, cnt


def estimate_poses(points, keypoints3d, camera_matrixes, valid_points_filter, offsets):
    """PnP on voted 2D points, with augmentation un-mapping.

    Args:
      points: [b, oc, vn, 2] voted points, (x, y) in network pixels.
      keypoints3d: [b, oc, ic, vn, 3].
      camera_matrixes: [b, 3, 3].
      valid_points_filter: [b, oc] int.
      offsets: [b, 10].
    Returns: (poses [b, oc, 3, 4], false_positive [oc]).
    """
    b, oc, ic, vn, _ = keypoints3d.shape
    pts = points.reshape(-1, vn, 2)
    filt = valid_points_filter.reshape(-1)
    off = jnp.broadcast_to(offsets[:, None], (b, oc, 10)).reshape(-1, 10)

    nonzero = jnp.abs(jnp.sum(pts.reshape(b * oc, -1), axis=1)) >= 0.01
    false_positive = ((filt == 0) & nonzero).astype(jnp.float32)
    false_positive = jnp.sum(false_positive.reshape(b, oc), axis=0)

    mapped = transform_points_back_batch(
        pts,
        off[:, 0:1],
        off[:, 1:2],
        off[:, 8:9],
        off[:, 9:10],
        off[:, 4:5],
        off[:, 5:6],
        off[:, 6:7],
        off[:, 7:8],
    )
    mapped = jnp.where(nonzero[:, None, None], mapped, 0.0)

    p6d = solve_pnp(mapped, keypoints3d[:, :, 0].reshape(-1, vn, 3), camera_matrixes[0])
    poses = pose_matrix_from_p6d(p6d)
    poses = jnp.where(nonzero[:, None, None], poses, 0.0)
    return poses.reshape(b, oc, 3, 4), false_positive


def evaluate_pose_estimates(
    points_estimated,
    poses,
    poses_gt,
    target_seg,
    object_points_3d,
    camera_data,
    diameters,
    evaluation_points=None,
    object_points_3d_count=None,
    min_num=20,
):
    """LS-voting path: poses already estimated (BPnP inside the loss).

    Mirrors pose_evaluation.py:104-160. Returns ([valid_2d, valid_3d,
    valid_count, zeros, err_2d, err_3d, missing, false_positive], poses,
    points_estimated).
    """
    b, h, w, c = target_seg.shape
    _, oc, ic, _, _ = poses_gt.shape

    available = jnp.sum(target_seg[:, :, :, 1:] != 0, axis=(1, 2))  # [b, oc]
    available = jnp.where(available > min_num, 1, 0)

    if evaluation_points is not None and object_points_3d_count is not None:
        object_points_3d, object_points_3d_count = _tile_eval_points(
            evaluation_points, object_points_3d_count, b, ic
        )
    else:
        object_points_3d_count = jnp.full((b, oc, ic), 9, jnp.int32)

    poses_first = poses[:, :, 0] if poses.ndim == 5 else poses
    err_2d, err_3d, valid_2d, valid_3d, missing, valid_count, false_pos = evaluate_poses(
        poses_first,
        poses_gt,
        points_estimated,
        object_points_3d,
        object_points_3d_count,
        camera_data,
        diameters,
        available,
        5.0,
    )
    return (
        [valid_2d, valid_3d, valid_count, jnp.zeros_like(valid_2d), err_2d, err_3d, missing, false_pos],
        poses,
        points_estimated,
    )


def estimate_and_evaluate_poses(
    output_seg,
    target_seg,
    output_vertex,
    poses_gt,
    object_points_3d,
    camera_data,
    diameters,
    offsets,
    evaluation_points=None,
    object_points_3d_count=None,
    points_estimated=None,
    min_num=20,
    ransac_rounds=1,
    rng_key=None,
):
    """RANSAC-voting path (pvnet / estimate_coords=0 models).

    Mirrors pose_evaluation.py:11-101: argmax segmentation, per-class field
    gather for pvnet outputs, RANSAC keypoint voting, PnP, metric eval.
    """
    import jax

    b, h, w, c = target_seg.shape
    _, oc, ic, _, _ = poses_gt.shape
    vc = object_points_3d.shape[3]

    available = jnp.sum(target_seg[:, :, :, 1:] != 0, axis=(1, 2))
    available = jnp.where(available > min_num, 1, 0)

    argmax_seg = jnp.argmax(output_seg, axis=3)
    mask_one_hot = (argmax_seg[..., None] == jnp.arange(c)[None, None, None]).astype(output_seg.dtype)
    if oc > 1 and output_vertex.shape[-1] == vc * oc * 2:
        ov = output_vertex.reshape(b, h, w, oc, vc, 2)
        sel = jnp.maximum(argmax_seg - 1, 0)
        ov = jnp.take_along_axis(ov, sel[..., None, None, None], axis=3)[:, :, :, 0]
        ov = jnp.where((argmax_seg == 0)[..., None, None], 0.0, ov)
        output_vertex = ov
    output_vertex = output_vertex.reshape(b, h, w, vc, 2)

    if points_estimated is None:
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        points_estimated = ransac_voting_layer_all_masks(
            mask_one_hot[:, :, :, 1:],
            output_vertex,
            512,
            inlier_thresh=0.99,
            max_iter=ransac_rounds,
            min_num=min_num,
            max_num=30000,
            rng_key=rng_key,
        )
    else:
        points_estimated = points_estimated * jnp.asarray([[[[h, w]]]], jnp.float32)

    poses, false_positive_mask = estimate_poses(
        points_estimated, object_points_3d, camera_data, available, offsets
    )

    if evaluation_points is not None and object_points_3d_count is not None:
        object_points_3d, object_points_3d_count = _tile_eval_points(
            evaluation_points, object_points_3d_count, b, ic
        )
    else:
        object_points_3d_count = jnp.full((b, oc, ic), 9, jnp.int32)

    err_2d, err_3d, valid_2d, valid_3d, missing, valid_count, false_pos = evaluate_poses(
        poses,
        poses_gt,
        points_estimated,
        object_points_3d,
        object_points_3d_count,
        camera_data,
        diameters,
        available,
        5.0,
    )
    return (
        [valid_2d, valid_3d, valid_count, false_positive_mask, err_2d, err_3d, missing, false_pos],
        poses,
        points_estimated,
    )


def poses_pnp(points_estimated, seg_estimated, object_points_3d, camera_data, no_objects, min_num=20):
    """Inference-only pose solve (the test_minimal hot path).

    Mirrors pose_evaluation.py:163-217: availability from predicted-mask
    pixel counts, BPnP-forward solve, rodrigues, t_z sign fix, masking.
    Runs entirely on device — this plus the network is the latency metric.
    """
    b, h, w, _ = seg_estimated.shape
    oc = no_objects
    ic = 1
    vc = object_points_3d.shape[3]

    pts = points_estimated.reshape(-1, vc, 2)[:, :, ::-1]  # (y,x) -> (x,y)
    pts3d = object_points_3d.reshape(-1, vc, 3)

    labels = jnp.argmax(seg_estimated, axis=-1)
    onehot = (labels[..., None] == (jnp.arange(oc) + 1)[None, None, None]).astype(jnp.int32)
    px_est = jnp.sum(onehot, axis=(1, 2))  # [b, oc]
    available = (px_est > min_num).reshape(-1, 1, 1).astype(jnp.float32)

    p6d = solve_pnp(pts, pts3d, camera_data[0])
    poses = pose_matrix_from_p6d(p6d)
    poses = poses * available
    return poses.reshape(b, oc, ic, 3, 4)
