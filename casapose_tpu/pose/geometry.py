"""Geometric primitives: rotations, projections, augmentation un-mapping.

Device-side (jnp) equivalents of the reference's TF/numpy geometry helpers:
  * rodrigues            <- casapose/utils/geometry_utils.py:206-236
  * project_batch        <- casapose/pose_estimation/ransac_voting.py:185-194
  * transform_points_back_batch
                         <- casapose/pose_estimation/ransac_voting.py:124-158
plus the host-side (numpy) helpers used by the data pipeline
(quaternion_matrix, transform_points, reproject/apply_offsets,
get_rotation_matrix_2D <- casapose/utils/geometry_utils.py:7-57,144-181).

Everything jnp here is shape-static, batched, and differentiable, so it can
live inside a single jit-compiled train/eval step.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.core.numerics import divide_no_nan, f32_precision

# ---------------------------------------------------------------------------
# Device-side (jnp)
# ---------------------------------------------------------------------------


@f32_precision
def rodrigues(rvecs):
    """Axis-angle rotation vectors [B, 3] -> rotation matrices [B, 3, 3].

    Zero-angle inputs return identity (guard as in the reference's
    ``rodrigues_batch``). Differentiable away from theta == 0.
    """
    rvecs = jnp.asarray(rvecs)
    b = rvecs.shape[0]
    thetas = jnp.linalg.norm(rvecs, axis=1, keepdims=True)  # [B,1]
    is_zero = (thetas[:, 0] == 0.0)[:, None, None]
    safe_thetas = jnp.where(thetas == 0.0, 1.0, thetas)
    u = rvecs / safe_thetas  # [B,3]
    zero = jnp.zeros([b], dtype=rvecs.dtype)
    K = jnp.stack(
        [
            jnp.stack([zero, -u[:, 2], u[:, 1]], axis=1),
            jnp.stack([u[:, 2], zero, -u[:, 0]], axis=1),
            jnp.stack([-u[:, 1], u[:, 0], zero], axis=1),
        ],
        axis=1,
    )  # [B,3,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvecs.dtype), (b, 3, 3))
    sin_t = jnp.sin(thetas)[..., None]
    cos_t = jnp.cos(thetas)[..., None]
    R = eye + sin_t * K + (1.0 - cos_t) * (K @ K)
    return jnp.where(is_zero, eye, R)


def rotation_to_rvec(R):
    """Rotation matrices [B, 3, 3] -> axis-angle vectors [B, 3] (log map).

    Inverse of :func:`rodrigues`; used to initialize Gauss-Newton pose
    refinement from an EPnP rotation estimate. Handles theta ~ 0 and
    theta ~ pi branches without NaNs.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)  # [B]
    # Generic branch: axis from the skew-symmetric part.
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # [B,3] == 2 sin(theta) * axis
    sin_theta = jnp.sin(theta)
    small = theta < 1e-5
    near_pi = theta > math.pi - 1e-3
    generic_scale = divide_no_nan(theta, 2.0 * sin_theta)[..., None]
    rvec_generic = w * jnp.where(small[..., None], 0.5, generic_scale)
    # theta ~ pi: axis from diagonal of (R + I) / 2 = aa^T-ish.
    axis_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1) + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonals (largest component positive).
    major = jnp.argmax(axis_sq, axis=-1)
    sx = jnp.sign(jnp.take_along_axis(w, major[..., None], axis=-1))
    sx = jnp.where(sx == 0, 1.0, sx)
    signs = jnp.stack(
        [
            jnp.sign(R[..., 0, 1] + R[..., 1, 0]),
            jnp.ones_like(theta),
            jnp.sign(R[..., 1, 2] + R[..., 2, 1]),
        ],
        axis=-1,
    )
    signs = jnp.where(signs == 0, 1.0, signs)
    rvec_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], rvec_pi, rvec_generic)


@f32_precision
def project_batch(xyz, K, RT):
    """Project 3D points with per-element pose.

    Args:
      xyz: [B, N, 3] model-frame points.
      K:   [3, 3] shared intrinsics (or [B, 3, 3]).
      RT:  [B, 3, 4] rigid transforms.
    Returns:
      xy [B, N, 2] pixel coordinates (0 where depth == 0, matching the
      reference's divide_no_nan), xyz_cam [B, N, 3] camera-frame points.
    """
    xyz_cam = xyz @ jnp.swapaxes(RT[:, :, :3], 1, 2) + jnp.swapaxes(RT[:, :, 3:], 1, 2)
    if K.ndim == 2:
        uvw = xyz_cam @ K.T[None]
    else:
        uvw = xyz_cam @ jnp.swapaxes(K, -1, -2)
    xy = divide_no_nan(uvw[:, :, :2], uvw[:, :, 2:])
    return xy, xyz_cam


def rotation_matrix_2d(center_x, center_y, angle_deg):
    """2x3 rotation-about-center matrices, batched over leading dims.

    Matches cv2.getRotationMatrix2D semantics with the reference's sign
    convention (casapose/pose_estimation/ransac_voting.py:60-68): positive
    ``angle`` rotates clockwise in image coordinates.
    """
    angle_rad = angle_deg * (math.pi / 180.0)
    a = jnp.cos(angle_rad)
    b = jnp.sin(angle_rad)
    c = (1.0 - a) * center_x - b * center_y
    d = b * center_x + (1.0 - a) * center_y
    row0 = jnp.stack([a, b, c], axis=-1)
    row1 = jnp.stack([-b, a, d], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # [..., 2, 3]


@f32_precision
def transform_points_back_batch(points, h_crop, w_crop, sx, sy, dx, dy, angle, scale):
    """Undo the train-time crop/rotate/translate/scale on 2D points.

    Inverse of the augmentation applied by the data pipeline; consumed by the
    keypoint reprojection loss and pose estimation so that poses live in the
    original full-image camera frame.

    Args:
      points: [B, N, 2] (x, y) points in network-output pixel space.
      h_crop, w_crop, sx, sy, dx, dy, angle, scale: [B, 1] offset columns
        (offsets tensor layout: [h_crop, w_crop, out_h, out_w, dx, dy,
        angle, scale, orig_w, orig_h]; sx = orig_w, sy = orig_h).
    Returns: [B, N, 2] points in original-image pixels.
    """
    b = points.shape[0]
    n = points.shape[1]
    pts = points / scale[..., None]
    z = jnp.zeros_like(dx)
    o = jnp.ones_like(dx)
    tm = jnp.stack(
        [
            jnp.concatenate([o, z, -dx], axis=1),
            jnp.concatenate([z, o, -dy], axis=1),
            jnp.concatenate([z, z, o], axis=1),
        ],
        axis=1,
    )  # [B,3,3]
    angle_rad = -angle * (math.pi / 180.0)
    a = jnp.cos(angle_rad)
    bb = jnp.sin(angle_rad)
    cx = sx[:, 0] / 2.0
    cy = sy[:, 0] / 2.0
    c = ((1.0 - a[:, 0]) * cx - bb[:, 0] * cy)[:, None]
    d = (bb[:, 0] * cx + (1.0 - a[:, 0]) * cy)[:, None]
    rm = jnp.stack(
        [
            jnp.concatenate([a, bb, c], axis=1),
            jnp.concatenate([-bb, a, d], axis=1),
            jnp.concatenate([z, z, o], axis=1),
        ],
        axis=1,
    )  # [B,3,3]
    pts = pts + jnp.concatenate([w_crop, h_crop], axis=1)[:, None, :]  # [B,1,2]
    homo = jnp.concatenate([jnp.swapaxes(pts, 1, 2), jnp.ones([b, 1, n], dtype=points.dtype)], axis=1)
    out = rm @ (tm @ homo)
    return jnp.swapaxes(out[:, 0:2], 1, 2)


# ---------------------------------------------------------------------------
# Host-side (numpy) — data pipeline / offline tooling
# ---------------------------------------------------------------------------


def get_rotation_matrix_2D_np(center, angle):
    """Host-side 2x3 rotation matrix (reference sign convention)."""
    angle_rad = angle * (np.pi / 180.0)
    a = np.cos(angle_rad)
    b = np.sin(angle_rad)
    c = (1 - a) * center[0] - b * center[1]
    d = b * center[0] + (1 - a) * center[1]
    return np.float32([[a, b, c], [-b, a, d]])


def reproject_np(points, tm, rm, offset):
    """Apply 2x3 rotation ``rm`` then translation ``tm`` then crop offset."""
    pts = np.asarray(points, dtype=np.float64)
    rmat = np.identity(3)
    rmat[0:2] = rm
    tmat = np.identity(3)
    tmat[0:2] = tm
    out = rmat @ np.vstack((pts.T, np.ones(len(pts))))
    out = tmat @ out
    out = out[0:2].T
    return out - offset


def apply_offsets_np(points, offsets):
    """Map original-image points into augmented network space (forward map).

    Note: the offsets layout is [h_crop, w_crop, out_h, out_w, dx, dy, angle,
    scale, orig_w, orig_h] (vectorfield_dataset.py:424-435). The reference's
    ``apply_offsets`` (geometry_utils.py:22-34) reads elements 0/1 as
    (w_crop, h_crop) — a latent swap bug in a visualization-only helper; we
    read the canonical layout so this is the exact forward map that
    :func:`transform_points_back_batch` inverts.
    """
    h_crop, w_crop = offsets[0], offsets[1]
    sx, sy = offsets[8], offsets[9]
    dx, dy, angle, scale = offsets[4], offsets[5], offsets[6], offsets[7]
    tm = np.float32([[1, 0, dx], [0, 1, dy]])
    rm = get_rotation_matrix_2D_np((sx / 2, sy / 2), angle)
    return reproject_np(points, tm, rm, [w_crop, h_crop]) * scale


def transform_points_np(points, transform):
    """Apply a fixed 3x4/4x4 model transform to [N, 3] points (host)."""
    p = np.asarray(points, dtype=np.float64)
    n = len(p)
    p = np.transpose(np.c_[p, np.ones(n)])
    p = np.transpose(np.matmul(transform, p))
    return p[:, 0:3]


def project_np(xyz, K, RT):
    """Host projection of [N,3] points; returns (xy [N,2], xyz_cam [N,3])."""
    xyz_cam = np.dot(xyz, RT[:, :3].T) + RT[:, 3:].T
    uvw = np.dot(xyz_cam, K.T)
    xy = uvw[:, :2] / uvw[:, 2:]
    return xy, xyz_cam


def quaternion_matrix_np(quaternion_xyzw, translation=None, wxyz_input=False):
    """Quaternion (xyzw by default) -> rotation matrix; optional [R|t].

    Semantics identical to the reference's transformations.py port
    (casapose/utils/geometry_utils.py:144-181): near-zero quaternions give
    identity; returns 3x3 without translation, 3x4 with.
    """
    q = np.array(quaternion_xyzw, dtype=np.float64, copy=True)
    if not wxyz_input:
        q = np.array([q[3], q[0], q[1], q[2]], dtype=np.float64)
    n = np.dot(q, q)
    if n < 0.0001:
        R = np.identity(3)
    else:
        q *= math.sqrt(2.0 / n)
        q = np.outer(q, q)
        R = np.array(
            [
                [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0]],
                [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0]],
                [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2]],
            ]
        )
    if translation is None:
        return R
    t = np.array(translation, dtype=np.float64, copy=True).reshape(3, 1)
    return np.concatenate([R, t], axis=1)


def matrix_to_quaternion_np(M):
    """Rotation matrix -> xyzw quaternion (w >= 0)."""
    Qxx, Qyx, Qzx, Qxy, Qyy, Qzy, Qxz, Qyz, Qzz = np.asarray(M).flat
    K = (
        np.array(
            [
                [Qxx - Qyy - Qzz, 0, 0, 0],
                [Qyx + Qxy, Qyy - Qxx - Qzz, 0, 0],
                [Qzx + Qxz, Qzy + Qyz, Qzz - Qxx - Qyy, 0],
                [Qyz - Qzy, Qzx - Qxz, Qxy - Qyx, Qxx + Qyy + Qzz],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[0, 1, 2, 3], np.argmax(vals)]
    if q[3] < 0:
        q *= -1
    return q


def create_transformation_matrix_np(R, t):
    """Stack R (3x3) and t (3,) into a homogeneous 4x4 matrix."""
    out = np.identity(4)
    out[:3, :3] = np.asarray(R)[:3, :3]
    out[:3, 3] = np.asarray(t).reshape(3)
    return out


def get_horizontal_width_angle_np(width, height, fx, fy):
    """Horizontal field of view in degrees (offline tooling helper)."""
    aspect = width / fx * (fy / height)
    return np.rad2deg(2.0 * np.arctan(aspect * (0.5 / (fy / height))))
