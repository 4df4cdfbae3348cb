"""Training losses, jit-compiled and fully batched.

Semantics follow the reference implementation:
  * smooth_l1_loss              <- casapose/utils/loss_functions.py:14-44
  * proxy_voting_loss / _dist   <- casapose/utils/loss_functions.py:47-203
  * keypoint_reprojection_loss  <- casapose/utils/loss_functions.py:207-344
  * composite_loss              <- train_casapose.py:40-145

TPU notes: the per-object reductions use one-hot einsum contractions instead
of ``tf.map_fn`` + ``unsorted_segment_sum`` (static shapes, MXU-friendly);
the BPnP pose solve is the on-device implicit-gradient solver from
``casapose_tpu.pose.bpnp`` rather than a host ``numpy_function`` escape.
"""

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from jax import lax

from casapose_tpu.core.numerics import divide_no_nan
from casapose_tpu.pose.bpnp import bpnp_pose
from casapose_tpu.pose.geometry import project_batch, rodrigues, transform_points_back_batch


@dataclasses.dataclass
class LossWeights:
    """Static loss configuration (hashable; safe as a jit static arg)."""

    mask_loss_weight: float = 1.0
    vertex_loss_weight: float = 0.5
    proxy_loss_weight: float = 0.015
    kp_loss_weight: float = 0.007
    filter_vertex_with_segmentation: bool = False
    filter_high_proxy_errors: bool = False

    def __hash__(self):
        return hash(dataclasses.astuple(self))


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * jnp.square(ax), ax - 0.5)


def _safe_norm(x, axis=-1, keepdims=True, eps=1e-12):
    """L2 norm with a finite gradient at zero (masked-out detections give
    exact-zero differences; plain norm has a NaN gradient there)."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims) + eps)


def smooth_l1_loss(
    vertex_pred,
    vertex_targets,
    vertex_weights,
    ignore_weights=False,
    invert_weights=False,
    normalize=True,
    reduce=True,
):
    """Masked smooth-L1 on vector fields.

    ``vertex_weights`` is typically the background mask channel with
    ``invert_weights=True`` (weight-inversion convention of the reference).
    Normalization divides each batch element by ver_dim * mask mass.
    """
    b = vertex_pred.shape[0]
    ver_dim = vertex_pred.shape[3]
    if ignore_weights:
        vertex_weights = jnp.ones_like(vertex_weights)
    elif invert_weights:
        vertex_weights = jnp.abs(1.0 - vertex_weights)

    diff = vertex_weights * (vertex_pred - vertex_targets)
    in_loss = _smooth_l1(diff)

    if normalize:
        in_loss = jnp.sum(in_loss.reshape(b, -1), axis=1) / (
            ver_dim * jnp.sum(vertex_weights.reshape(b, -1), axis=1) + 1e-3
        )
    if reduce:
        in_loss = jnp.mean(in_loss)
    return in_loss


def _proxy_perp_foot_dist(vertex_pred, keypoint_targets, vertex_one_hot_weights, vertex_weights):
    """Per-pixel perpendicular-foot distance of predicted lines to GT keypoints.

    Args:
      vertex_pred: [b, h, w, vn*2] predicted directions, (dy, dx) pairs.
      keypoint_targets: [b, oc, ic, vn, 2] GT 2D keypoints, (y, x) order.
      vertex_one_hot_weights: [b, h, w, oc] per-object one-hot foreground.
      vertex_weights: [b, h, w, 1] foreground mask (already inverted).
    Returns:
      dist [b, h, w, vn] (zero on background), argmax object map [b, h, w].
    """
    b, h, w, ver_dim = vertex_pred.shape
    vn = ver_dim // 2

    oc = vertex_one_hot_weights.shape[-1]
    ic = keypoint_targets.shape[2]
    obj_idx = jnp.argmax(vertex_one_hot_weights, axis=-1)  # [b,h,w]
    # Per-pixel keypoint selection as a one-hot contraction (take_along_axis
    # over a pixel-broadcast keypoint tensor builds a huge gather operand).
    onehot = (obj_idx[..., None] == jnp.arange(oc)[None, None, None]).astype(vertex_pred.dtype)
    kp = jnp.einsum(
        "bhwc,bcf->bhwf", onehot, keypoint_targets.reshape(b, oc, ic * vn * 2)
    ).reshape(b, h, w, ic, vn, 2)
    # Keypoints are stored (y, x); build (x, -y) for the cross-product form.
    k_y = kp[..., 0:1]
    k_x = kp[..., 1:2]
    kp_cross = jnp.concatenate([k_x, -k_y], axis=-1)  # [b,h,w,ic,vn,2]

    v = vertex_pred.reshape(b, h, w, vn, 2)
    v_norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=4))[:, :, :, None]  # [b,h,w,1,vn]

    c_x = (jnp.arange(w, dtype=vertex_pred.dtype) + 0.5)[None, None, :, None]
    c_y = (jnp.arange(h, dtype=vertex_pred.dtype) + 0.5)[None, :, None, None]
    # d_2 = v0 * (-c_x) + v1 * c_y; v = (dy, dx).
    d_2 = (v[..., 0] * (-c_x) + v[..., 1] * c_y)[:, :, :, None]  # [b,h,w,1,vn]
    d_1 = jnp.sum(v[:, :, :, None] * kp_cross, axis=5)  # [b,h,w,ic,vn]

    dist = jnp.min(divide_no_nan(jnp.abs(d_1 + d_2), v_norm), axis=3)  # [b,h,w,vn]
    dist = jnp.abs(vertex_weights * dist)
    return dist, obj_idx


def _gather_separated_fields(vertex_pred, vertex_one_hot_weights, vertex_weights, oc, vn):
    """pvnet-style multi-field handling: select each pixel's own-class field."""
    b, h, w, _ = vertex_pred.shape
    vp = vertex_pred.reshape(b, h, w, oc, vn * 2)
    obj_idx = jnp.argmax(vertex_one_hot_weights, axis=3)
    onehot = (obj_idx[..., None] == jnp.arange(oc)[None, None, None]).astype(vertex_pred.dtype)
    vp = jnp.einsum("bhwc,bhwcf->bhwf", onehot, vp)
    vp = jnp.where(vertex_weights > 0, 0.0, vp)
    return vp


def proxy_voting_dist(
    vertex_pred,
    keypoint_targets,
    vertex_one_hot_weights,
    vertex_weights,
    invert_weights=False,
    min_object_pixel=20,
):
    """Per-pixel proxy distances plus per-object normalized losses.

    Returns (dist [b,h,w,vn], per-object loss [b, oc]); used for
    ``filter_high_proxy_errors`` and test-time reporting.
    """
    b, h, w, ver_dim = vertex_pred.shape
    oc = vertex_one_hot_weights.shape[3]
    vn = keypoint_targets.shape[3]

    if oc > 1 and ver_dim == oc * vn * 2:
        vertex_pred = _gather_separated_fields(vertex_pred, vertex_one_hot_weights, vertex_weights, oc, vn)
        ver_dim = vn * 2

    if invert_weights:
        vertex_weights = jnp.abs(1.0 - vertex_weights)

    dist, _ = _proxy_perp_foot_dist(vertex_pred, keypoint_targets, vertex_one_hot_weights, vertex_weights)

    mask_sum = jnp.sum(vertex_one_hot_weights, axis=(1, 2))  # [b, oc]
    valid = jnp.where(mask_sum >= min_object_pixel, 1.0, 0.0)
    in_loss = jnp.sum(_smooth_l1(dist), axis=-1)  # [b,h,w]
    # Per-object segment sum as a one-hot contraction (foreground pixels
    # carry exactly one hot channel; background contributes zero loss).
    per_object = jnp.einsum("bhw,bhwo->bo", in_loss, vertex_one_hot_weights)
    per_object = divide_no_nan(valid * per_object, (ver_dim / 2) * mask_sum + 1e-3)
    return dist, per_object


def proxy_voting_loss(
    vertex_pred,
    keypoint_targets,
    vertex_one_hot_weights,
    vertex_weights,
    invert_weights=False,
    normalize=True,
    reduce=True,
    loss_per_object=False,
    min_object_pixel=20,
):
    """PVNet proxy voting loss (smooth-L1 of perpendicular-foot distances)."""
    b, h, w, ver_dim = vertex_pred.shape
    if invert_weights:
        vertex_weights = jnp.abs(1.0 - vertex_weights)

    dist, _ = _proxy_perp_foot_dist(vertex_pred, keypoint_targets, vertex_one_hot_weights, vertex_weights)

    if loss_per_object and normalize:
        mask_sum = jnp.sum(vertex_one_hot_weights, axis=(1, 2))  # [b, oc]
        valid = jnp.where(mask_sum >= min_object_pixel, 1.0, 0.0)
        count = jnp.sum(valid != 0, axis=1)
        in_loss = jnp.sum(_smooth_l1(dist), axis=-1)
        per_object = jnp.einsum("bhw,bhwo->bo", in_loss, vertex_one_hot_weights)
        per_object = divide_no_nan(valid * per_object, ver_dim * mask_sum + 1e-3)
        in_loss = divide_no_nan(jnp.sum(per_object, axis=1), count.astype(vertex_pred.dtype))
    else:
        in_loss = _smooth_l1(dist)
        if normalize:
            in_loss = jnp.sum(in_loss.reshape(b, -1), axis=1) / (
                ver_dim * jnp.sum(vertex_weights.reshape(b, -1), axis=1) + 1e-3
            )
    if reduce:
        in_loss = jnp.mean(in_loss)
    return in_loss


def keypoint_reprojection_loss(
    points_estimated,
    seg_estimated,
    poses_gt,
    object_points_3d,
    target_seg,
    camera_data,
    offsets,
    confidence,
    max_pixel_error=25.0,
    confidence_regularization=False,
    min_num=20,
    min_num_gt=-1,
    use_bpnp_reprojection_loss=False,
    estimate_poses=False,
    filter_with_gt=True,
):
    """Smooth-L1 between LS-voted keypoints and GT-pose reprojections.

    Optionally estimates poses on-device with the differentiable BPnP solver
    (pure JAX EPnP + Gauss-Newton; no host round-trip) and, in BPnP mode,
    penalizes both est-vs-voted and gt-vs-est reprojections.

    Args:
      points_estimated: [b, oc, vc, 2] voted keypoints in (y, x) pixels.
      seg_estimated:    [b, h, w, 1+oc] segmentation logits.
      poses_gt:         [b, oc, ic, 3, 4].
      object_points_3d: [b, oc, ic, vc, 3].
      target_seg:       [b, h, w, 1+oc] one-hot GT segmentation.
      camera_data:      [b, 3, 3]; element 0 is used (shared intrinsics).
      offsets:          [b, 10] augmentation offsets.
      confidence:       [b, h, w, vc] raw confidence maps (pre-softplus).
    Returns:
      (loss scalar, poses_est [b, oc, ic, 3, 4] or None,
       points_estimated [b, oc, vc, 2] in original-image (x, y) pixels).
    """
    b, h, w, c = target_seg.shape
    _, oc, ic, _, _ = poses_gt.shape
    vc = object_points_3d.shape[3]
    dtype = points_estimated.dtype

    offsets_b = jnp.broadcast_to(offsets[:, None], (b, oc, 10)).reshape(-1, 10)
    pts = points_estimated.reshape(-1, vc, 2)[:, :, ::-1]  # (y,x) -> (x,y)
    object_points_3d = lax.stop_gradient(object_points_3d.reshape(-1, vc, 3))
    poses_gt = poses_gt.reshape(-1, 3, 4)

    seg_estimated = lax.stop_gradient(seg_estimated)
    # Hard one-hot of the predicted segmentation (== softmax(x*1e6) trick).
    est_labels = jnp.argmax(seg_estimated, axis=-1)  # [b,h,w]

    px_gt = jnp.sum(target_seg[:, :, :, 1:] != 0, axis=(1, 2))  # [b, oc]
    onehot_est = (est_labels[..., None] == (jnp.arange(oc) + 1)[None, None, None]).astype(jnp.int32)
    px_est = jnp.sum(onehot_est, axis=(1, 2))  # [b, oc]

    available = jnp.where(px_est > min_num, 1, 0)
    if filter_with_gt:
        thresh_gt = min_num if min_num_gt < 0 else min_num_gt
        available = available * jnp.where(px_gt > thresh_gt, 1, 0)
    available = available.reshape(-1, 1)[:, None].astype(dtype)  # [b*oc, 1, 1]

    confidence_loss = 0.0
    if confidence_regularization:
        conf = jnp.logaddexp(confidence, 0.0)  # softplus
        fg = jnp.abs(target_seg[:, :, :, 0:1] - 1.0)
        conf_sum = jnp.sum(conf * fg, axis=(1, 2), keepdims=True)
        fg_sum = jnp.sum(fg, axis=(1, 2, 3), keepdims=True)
        confidence_loss = jnp.mean(jnp.abs(divide_no_nan(conf_sum, fg_sum) - 0.7))

    pts = transform_points_back_batch(
        pts,
        offsets_b[:, 0:1],
        offsets_b[:, 1:2],
        offsets_b[:, 8:9],
        offsets_b[:, 9:10],
        offsets_b[:, 4:5],
        offsets_b[:, 5:6],
        offsets_b[:, 6:7],
        offsets_b[:, 7:8],
    )

    cam = lax.stop_gradient(camera_data[0])

    poses_est = None
    if use_bpnp_reprojection_loss or estimate_poses:
        p6d = bpnp_pose(pts, object_points_3d, cam)  # [b*oc, 6]
        R_out = rodrigues(p6d[:, 0:3])
        T_out = p6d[:, 3:6][..., None]
        poses_flat = jnp.concatenate([R_out, T_out], axis=-1)
        poses_flat = jnp.where(T_out[:, 2:3, :] < 0, -poses_flat, poses_flat)
        reproj_est, _ = project_batch(object_points_3d, cam, poses_flat)
        reproj_est = reproj_est * available
        poses_est = (poses_flat * available).reshape(b, oc, ic, 3, 4)

    reproj_gt, _ = project_batch(object_points_3d, cam, poses_gt)
    reproj_gt = reproj_gt * available
    pts = pts * available

    if use_bpnp_reprojection_loss:
        l1 = _safe_norm(reproj_est - pts)
        l2 = _safe_norm(reproj_gt - reproj_est)
        loss = (l1 + l2) / 2.0
    else:
        loss = _safe_norm(reproj_gt - pts)

    loss = _smooth_l1(loss)
    loss = jnp.where(loss > max_pixel_error, max_pixel_error + (loss - max_pixel_error) * 0.01, loss)
    loss = loss * available
    loss = jnp.mean(loss, axis=(1, 2))  # [b*oc]
    loss = divide_no_nan(jnp.sum(loss), jnp.sum(available))

    if confidence_regularization:
        loss = loss + confidence_loss

    return loss, poses_est, pts.reshape(b, oc, vc, 2)


def composite_loss(
    output_seg,
    target_seg,
    output_vert,
    target_vert,
    target_points,
    loss_weights: LossWeights,
    filtered_seg: Optional[Any] = None,
    pixel_gt_count: Optional[Any] = None,
    kp_loss: Optional[Any] = None,
):
    """Total loss = w_m*mask_CE + w_v*smoothL1 + w_p*proxy + w_k*keypoint.

    Mirrors the ``compute_loss`` closure of the reference train/test scripts,
    including ``filter_vertex_with_segmentation`` (replace the vertex-loss
    segmentation target where the prediction disagrees) and
    ``filter_high_proxy_errors`` (drop objects with proxy error >= 5).
    Returns [loss, mask_loss, vertex_loss, proxy_loss, kp_loss].
    """
    oc = target_seg.shape[3] - 1
    vn = target_points.shape[3]
    vc = vn * 2
    dtype = output_seg.dtype
    mask_loss = jnp.zeros([], dtype)
    vertex_loss = jnp.zeros([], dtype)
    proxy_loss = jnp.zeros([], dtype)
    separated_vectors = oc > 1 and output_vert.shape[-1] == oc * vc

    if loss_weights.mask_loss_weight > 0.0:
        # Numerically-stable softmax cross entropy with (one-hot) labels.
        shifted = output_seg - lax.stop_gradient(jnp.max(output_seg, -1, keepdims=True))
        log_z = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))
        mask_loss = jnp.mean(jnp.sum(target_seg * (log_z - shifted), axis=-1))

    if filtered_seg is not None:
        labels = filtered_seg[..., 0].astype(jnp.int32)
        target_seg = (labels[..., None] == jnp.arange(oc + 1)[None, None, None]).astype(dtype)
    if loss_weights.filter_vertex_with_segmentation:
        agree = jnp.argmax(target_seg, -1)[..., None] == jnp.argmax(output_seg, -1)[..., None]
        bg = jnp.zeros([oc + 1], dtype).at[0].set(1.0)
        target_seg = jnp.where(agree, target_seg, bg)

    if loss_weights.filter_high_proxy_errors and pixel_gt_count is not None:
        _, object_loss_values = proxy_voting_dist(
            output_vert,
            target_points,
            vertex_one_hot_weights=target_seg[:, :, :, 1:],
            vertex_weights=target_seg[:, :, :, 0:1],
            invert_weights=True,
        )
        keep = jnp.concatenate(
            [jnp.ones([object_loss_values.shape[0], 1], dtype), (object_loss_values < 5).astype(dtype)], axis=-1
        )
        keep = lax.stop_gradient(keep[:, None, None])  # [b,1,1,1+oc]
        cond = jnp.sum(keep * target_seg, axis=-1, keepdims=True) > 0
        bg = jnp.zeros([oc + 1], dtype).at[0].set(1.0)
        target_seg = jnp.where(cond, target_seg, bg)

    target_seg = lax.stop_gradient(target_seg)
    if loss_weights.vertex_loss_weight > 0.0:
        if separated_vectors:
            vertex_loss = sum(
                smooth_l1_loss(
                    output_vert[:, :, :, i * vc : (i + 1) * vc],
                    target_vert[:, :, :, i * vc : (i + 1) * vc],
                    target_seg[:, :, :, i + 1 : i + 2],
                )
                for i in range(oc)
            )
        else:
            vertex_loss = smooth_l1_loss(output_vert, target_vert, target_seg[:, :, :, 0:1], invert_weights=True)

    if loss_weights.proxy_loss_weight > 0.0:
        if separated_vectors:
            proxy_loss = sum(
                proxy_voting_loss(
                    output_vert[:, :, :, i * vc : (i + 1) * vc],
                    target_points[:, i : i + 1],
                    vertex_one_hot_weights=target_seg[:, :, :, i + 1 : i + 2],
                    vertex_weights=target_seg[:, :, :, i + 1 : i + 2],
                )
                for i in range(oc)
            )
        else:
            proxy_loss = proxy_voting_loss(
                output_vert,
                target_points,
                vertex_one_hot_weights=target_seg[:, :, :, 1:],
                vertex_weights=target_seg[:, :, :, 0:1],
                invert_weights=True,
                loss_per_object=False,
            )

    if kp_loss is None:
        kp_loss = jnp.zeros([], dtype)

    loss = (
        mask_loss * loss_weights.mask_loss_weight
        + proxy_loss * loss_weights.proxy_loss_weight
        + vertex_loss * loss_weights.vertex_loss_weight
        + kp_loss * loss_weights.kp_loss_weight
    )
    return [loss, mask_loss, vertex_loss, proxy_loss, kp_loss]
