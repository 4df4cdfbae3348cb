"""Batched, on-device PnP: EPnP initialization + Gauss-Newton refinement.

This replaces the reference's host-side OpenCV escapes
(``cv2.solvePnPRansac(EPnP)`` + ``cv2.solvePnP(ITERATIVE)`` called through
``tf.numpy_function`` at casapose/pose_estimation/ransac_voting.py:13-57 and
casapose/pose_estimation/bpnp_layers.py:86-135) with pure ``jax.numpy``
linear algebra: every pose in a batch is solved simultaneously inside the
same jit program, so the pose solve costs one fused device launch instead of
a host round-trip per detection.

Algorithm:
  1. EPnP (Lepetit et al. 2009): PCA control points, barycentric
     coordinates, null-space of the 2N x 12 projection constraint matrix
     (via eigh of the 12x12 normal matrix), beta cases N=1 and N=2, best
     case chosen by reprojection error, pose recovered with Procrustes.
  2. Fixed-iteration damped Gauss-Newton on (rvec, t) minimizing the
     reprojection error (the on-device analogue of SOLVEPNP_ITERATIVE).

All shapes are static; degenerate inputs (all-zero 2D points, the
reference's "missing object" convention) yield a finite placeholder pose
that callers mask out, never NaN.
"""

from functools import partial

import jax
import jax.numpy as jnp

from casapose_tpu.core.numerics import divide_no_nan, f32_precision
from casapose_tpu.pose.geometry import rodrigues, rotation_to_rvec


def _control_points(pts3d):
    """PCA control points per batch element. pts3d: [B, N, 3] -> [B, 4, 3]."""
    c0 = jnp.mean(pts3d, axis=1, keepdims=True)  # [B,1,3]
    centered = pts3d - c0
    cov = jnp.einsum("bni,bnj->bij", centered, centered) / pts3d.shape[1]
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-12))[:, None, :]  # [B,1,3]
    ctrl = c0 + jnp.swapaxes(eigvec * scale, 1, 2)  # rows = c0 + s_k v_k
    return jnp.concatenate([c0, ctrl], axis=1)  # [B,4,3]


def _barycentric(pts3d, ctrl):
    """Barycentric coordinates of each point in the control-point frame."""
    b = pts3d.shape[0]
    ones_c = jnp.ones((b, 4, 1), pts3d.dtype)
    C = jnp.concatenate([ctrl, ones_c], axis=2)  # [B,4,4] rows=[c_j, 1]
    ones_p = jnp.ones((b, pts3d.shape[1], 1), pts3d.dtype)
    P = jnp.concatenate([pts3d, ones_p], axis=2)  # [B,N,4]
    # alpha @ C = P  ->  alpha = P @ C^{-1}
    return P @ jnp.linalg.inv(C)  # [B,N,4]


def _build_M(alphas, pts2d, fx, fy, cx, cy):
    """Constraint matrix rows; returns M^T M [B, 12, 12]."""
    b, n, _ = alphas.shape
    u = pts2d[..., 0]  # [B,N]
    v = pts2d[..., 1]
    zeros = jnp.zeros_like(alphas)
    # Row u: [a_j*fx, 0, a_j*(cx-u)] per control j.
    ru = jnp.stack([alphas * fx, zeros, alphas * (cx - u)[..., None]], axis=-1)  # [B,N,4,3]
    rv = jnp.stack([zeros, alphas * fy, alphas * (cy - v)[..., None]], axis=-1)
    M = jnp.concatenate([ru.reshape(b, n, 12)[:, :, None], rv.reshape(b, n, 12)[:, :, None]], axis=2)
    M = M.reshape(b, 2 * n, 12)
    return jnp.einsum("bri,brj->bij", M, M)


def _solve_scale(v_ctrl, ctrl_w):
    """Least-squares scale beta s.t. pairwise camera distances match world."""
    ii, jj = jnp.triu_indices(4, k=1)
    dc = v_ctrl[:, ii] - v_ctrl[:, jj]  # [B,6,3]
    dw = ctrl_w[:, ii] - ctrl_w[:, jj]
    num = jnp.sum(jnp.linalg.norm(dc, axis=-1) * jnp.linalg.norm(dw, axis=-1), axis=-1)
    den = jnp.sum(jnp.sum(jnp.square(dc), axis=-1), axis=-1)
    return divide_no_nan(num, den)  # [B]


def _procrustes(pts_w, pts_c):
    """Rigid transform (R, t) minimizing ||R pts_w + t - pts_c|| (Kabsch)."""
    cw = jnp.mean(pts_w, axis=1, keepdims=True)
    cc = jnp.mean(pts_c, axis=1, keepdims=True)
    H = jnp.einsum("bni,bnj->bij", pts_w - cw, pts_c - cc)  # [B,3,3]
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.swapaxes(Vt, 1, 2) @ jnp.swapaxes(U, 1, 2))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("bji,bj,bjk->bik", Vt, D, jnp.swapaxes(U, 1, 2))  # V diag(D) U^T
    t = cc[:, 0] - jnp.einsum("bij,bj->bi", R, cw[:, 0])
    return R, t


def _pose_from_null(vker, alphas, pts3d, ctrl_w):
    """Camera-frame control points (up to sign/scale) -> (R, t)."""
    v_ctrl = vker.reshape(-1, 4, 3)
    beta = _solve_scale(v_ctrl, ctrl_w)[:, None, None]
    cam_ctrl = v_ctrl * beta
    pts_c = alphas @ cam_ctrl  # [B,N,3]
    # Cheirality: points must be in front of the camera.
    flip = jnp.where(jnp.mean(pts_c[..., 2], axis=1, keepdims=True) < 0, -1.0, 1.0)[..., None]
    pts_c = pts_c * flip
    return _procrustes(pts3d, pts_c)


def _reproj_sq_err(pts2d, pts3d, K, R, t):
    cam = jnp.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = divide_no_nan(cam[..., :2], cam[..., 2:])
    uv = uv * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])
    return jnp.mean(jnp.sum(jnp.square(uv - pts2d), axis=-1), axis=-1)  # [B]


@f32_precision
def epnp(pts2d, pts3d, K):
    """EPnP pose estimate.

    Args:
      pts2d: [B, N, 2] pixel coordinates (x, y).
      pts3d: [B, N, 3] model-frame points.
      K: [3, 3] intrinsics (shared across batch).
    Returns:
      (R [B, 3, 3], t [B, 3]).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ctrl_w = _control_points(pts3d)
    alphas = _barycentric(pts3d, ctrl_w)
    MtM = _build_M(alphas, pts2d, fx, fy, cx, cy)
    _, eigvec = jnp.linalg.eigh(MtM)  # ascending eigenvalues

    # Beta case N=1: smallest eigenvector alone.
    R1, t1 = _pose_from_null(eigvec[..., 0], alphas, pts3d, ctrl_w)
    e1 = _reproj_sq_err(pts2d, pts3d, K, R1, t1)

    # Beta case N=2: distance constraints on beta1 * v1 + beta2 * v2.
    v1 = eigvec[..., 0].reshape(-1, 4, 3)
    v2 = eigvec[..., 1].reshape(-1, 4, 3)
    ii, jj = jnp.triu_indices(4, k=1)
    d1 = v1[:, ii] - v1[:, jj]  # [B,6,3]
    d2 = v2[:, ii] - v2[:, jj]
    dw = ctrl_w[:, ii] - ctrl_w[:, jj]
    # ||b1 d1 + b2 d2||^2 = b11 |d1|^2 + 2 b12 <d1,d2> + b22 |d2|^2 = |dw|^2
    A = jnp.stack(
        [
            jnp.sum(d1 * d1, axis=-1),
            2.0 * jnp.sum(d1 * d2, axis=-1),
            jnp.sum(d2 * d2, axis=-1),
        ],
        axis=-1,
    )  # [B,6,3]
    rhs = jnp.sum(dw * dw, axis=-1)[..., None]  # [B,6,1]
    # Batched least squares via damped normal equations (lstsq is not
    # batched in jnp): sol = (A^T A + eps I)^{-1} A^T rhs.
    AtA = jnp.einsum("bij,bik->bjk", A, A) + 1e-10 * jnp.eye(3, dtype=A.dtype)
    Atr = jnp.einsum("bij,bik->bjk", A, rhs)
    sol = jnp.linalg.solve(AtA, Atr)[..., 0]  # [B,3] = [b11, b12, b22]
    b1 = jnp.sqrt(jnp.maximum(sol[:, 0], 1e-12))
    b2_mag = jnp.sqrt(jnp.maximum(sol[:, 2], 1e-12))
    b2 = jnp.where(sol[:, 1] < 0, -b2_mag, b2_mag)
    vker2 = (b1[:, None, None] * v1 + b2[:, None, None] * v2).reshape(-1, 12)
    R2, t2 = _pose_from_null(vker2, alphas, pts3d, ctrl_w)
    e2 = _reproj_sq_err(pts2d, pts3d, K, R2, t2)

    use1 = (e1 <= e2)[:, None, None]
    R = jnp.where(use1, R1, R2)
    t = jnp.where(use1[..., 0], t1, t2)
    return R, t


def _residuals(p6d, pts3d, K):
    """Reprojection residuals [2N] for a single pose p6d=[rvec, t]."""
    R = rodrigues(p6d[None, 0:3])[0]
    cam = pts3d @ R.T + p6d[3:6]
    z = cam[:, 2:]
    uv = divide_no_nan(cam[:, :2], z)
    uv = uv * jnp.array([K[0, 0], K[1, 1]], p6d.dtype) + jnp.array([K[0, 2], K[1, 2]], p6d.dtype)
    return uv


def _gn_step(p6d, pts2d, pts3d, K, damping):
    def f(p):
        return (_residuals(p, pts3d, K) - pts2d).reshape(-1)

    r = f(p6d)
    J = jax.jacfwd(f)(p6d)  # [2N, 6]
    JtJ = J.T @ J
    Jtr = J.T @ r
    H = JtJ + damping * jnp.eye(6, dtype=p6d.dtype) * (1.0 + jnp.diag(JtJ))
    delta = jnp.linalg.solve(H, Jtr)
    delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
    return p6d - delta


@partial(jax.jit, static_argnames=("iterations",))
@f32_precision
def solve_pnp(pts2d, pts3d, K, iterations=10):
    """Full PnP: EPnP init + damped Gauss-Newton refinement.

    Args:
      pts2d: [B, N, 2] (x, y) pixel points. All-(near-)zero rows are the
        reference's "missing object" convention and produce the finite
        placeholder pose [rvec=0, t=(0,0,1)] which callers mask out.
      pts3d: [B, N, 3] model points.
      K: [3, 3] intrinsics.
      iterations: fixed Gauss-Newton iteration count (static).
    Returns:
      p6d [B, 6] = [rvec | t].
    """
    dtype = pts2d.dtype
    b, n, _ = pts2d.shape
    degenerate = jnp.abs(jnp.sum(pts2d.reshape(b, -1), axis=1)) < 1e-4  # [B]
    # Substitute a consistent synthetic problem (projection of pts3d under
    # the placeholder pose) for degenerate rows so all linear algebra stays
    # finite; the placeholder result is spliced back in at the end.
    placeholder = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0], dtype)
    synth = jax.vmap(_residuals, in_axes=(None, 0, None))(placeholder, pts3d, K)  # [B,N,2]
    safe_pts2d = jnp.where(degenerate[:, None, None], synth, pts2d)
    R0, t0 = epnp(safe_pts2d, pts3d, K)
    rvec0 = rotation_to_rvec(R0)
    p6d = jnp.concatenate([rvec0, t0], axis=1)
    # Keep t_z away from zero for stability.
    tz = p6d[:, 5:6]
    p6d = jnp.concatenate([p6d[:, :5], jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)], axis=1)
    p6d = jnp.where(jnp.isfinite(p6d), p6d, 0.0)

    def body(_, p):
        return jax.vmap(_gn_step, in_axes=(0, 0, 0, None, None))(p, safe_pts2d, pts3d, K, jnp.asarray(1e-6, dtype))

    p6d = jax.lax.fori_loop(0, iterations, body, p6d)
    p6d = jnp.where(jnp.isfinite(p6d), p6d, 0.0)
    return jnp.where(degenerate[:, None], placeholder, p6d)


def pose_matrix_from_p6d(p6d):
    """[B, 6] -> [B, 3, 4] with the reference's t_z sign fix applied."""
    R = rodrigues(p6d[:, 0:3])
    t = p6d[:, 3:6][..., None]
    RT = jnp.concatenate([R, t], axis=-1)
    return jnp.where(t[:, 2:3] < 0, -RT, RT)
