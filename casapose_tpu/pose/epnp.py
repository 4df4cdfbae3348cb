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
    """Axis-aligned control points per batch element: [B, N, 3] -> [B, 4, 3].

    EPnP works with any non-degenerate affine control basis; the reference
    (cv2) uses PCA axes, but a TPU eigh costs a QR while_loop. Axis-aligned
    axes scaled by the per-axis spread (floored to stay non-degenerate for
    near-planar point sets) give the same solution at no eigh cost.
    """
    c0 = jnp.mean(pts3d, axis=1, keepdims=True)  # [B,1,3]
    centered = pts3d - c0
    std = jnp.sqrt(jnp.mean(jnp.square(centered), axis=1))  # [B,3]
    floor = 1e-3 * jnp.maximum(jnp.max(std, axis=1, keepdims=True), 1e-9)
    scale = jnp.maximum(std, floor)[:, :, None]  # [B,3,1]
    ctrl = c0 + jnp.eye(3, dtype=pts3d.dtype)[None] * scale
    return jnp.concatenate([c0, ctrl], axis=1)  # [B,4,3]


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _cholesky_solve_spd(A, b):
    """Solve A x = b for small SPD A with a fully-unrolled Cholesky.

    n is a static Python int (6 for the LM normal equations); unrolling
    avoids jnp.linalg.solve's LU while_loops on TPU.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    # Forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _chol_factor(A):
    """Unrolled batched Cholesky factor of [B, n, n] SPD (n static, small).

    Returns the lower factor as a Python grid of [B] entries — pure
    elementwise ops that XLA fuses; no LU/QR while_loops.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[:, i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_list(L, b):
    """Solve L L^T x = b given a factor grid; b = list of n [B] entries."""
    n = len(b)
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _smallest_eigvecs2(A, iters=6):
    """Two smallest eigenpairs of symmetric PSD [B, 12, 12] matrices.

    Inverse subspace iteration with a single unrolled Cholesky
    factorization: factor (A + eps I) once, then repeatedly solve — the
    spectral gap 1/lambda_1 vs 1/lambda_2 is huge for near-singular EPnP
    normal matrices, so a handful of iterations converge; a closed-form
    2x2 Rayleigh-Ritz rotation finishes. Backward-stable in float32 on
    TPU (a Newton-Schulz approximate inverse was not), and everything is
    fixed-iteration elementwise math — no QR/LU while_loops (jnp.linalg
    .eigh costs minutes of TPU compile time and is inaccurate here).
    """
    b, n, _ = A.shape
    dtype = A.dtype
    trace = jnp.trace(A, axis1=1, axis2=2)[:, None, None]
    An = A + (1e-6 * trace + 1e-30) * jnp.eye(n, dtype=dtype)[None]
    L = _chol_factor(An)

    v1 = [jnp.full((b,), 1.0 + 0.1 * i, dtype) for i in range(n)]
    v2 = [jnp.full((b,), 2.0 - 0.2 * i, dtype) for i in range(n)]
    for _ in range(iters):
        v1 = _chol_solve_list(L, v1)
        v2 = _chol_solve_list(L, v2)
        n1 = jnp.sqrt(jnp.maximum(sum(v * v for v in v1), 1e-30))
        v1 = [v / n1 for v in v1]
        d = sum(a_ * b_ for a_, b_ in zip(v1, v2))
        v2 = [b_ - d * a_ for a_, b_ in zip(v1, v2)]
        n2 = jnp.sqrt(jnp.maximum(sum(v * v for v in v2), 1e-30))
        v2 = [v / n2 for v in v2]

    V1 = jnp.stack(v1, -1)
    V2 = jnp.stack(v2, -1)
    # Rayleigh-Ritz on the 2D subspace: rotate to diagonalize V^T A V.
    T11 = jnp.einsum("bi,bij,bj->b", V1, A, V1)
    T22 = jnp.einsum("bi,bij,bj->b", V2, A, V2)
    T12 = jnp.einsum("bi,bij,bj->b", V1, A, V2)
    theta = 0.5 * jnp.arctan2(2.0 * T12, T11 - T22 + 1e-30)
    c, s = jnp.cos(theta), jnp.sin(theta)
    r1 = c[:, None] * V1 + s[:, None] * V2
    r2 = -s[:, None] * V1 + c[:, None] * V2
    e1 = jnp.einsum("bi,bij,bj->b", r1, A, r1)
    e2 = jnp.einsum("bi,bij,bj->b", r2, A, r2)
    first_smaller = (e1 <= e2)[:, None]
    v_min = jnp.where(first_smaller, r1, r2)
    v_2nd = jnp.where(first_smaller, r2, r1)
    return v_min, v_2nd


def _barycentric(pts3d, ctrl):
    """Barycentric coordinates of each point in the control-point frame.

    With the axis-aligned control basis of :func:`_control_points`
    (c_i = c0 + s_i e_i) the coordinates have a closed form — no 4x4
    linear solve (TPU LU lowers to expensive while_loops):
      alpha_i = (x - c0)_i / s_i,  alpha_0 = 1 - sum(alpha_i).
    """
    c0 = ctrl[:, 0:1]  # [B,1,3]
    s = ctrl[:, 1:4] - c0  # [B,3,3] diagonal-ish: row i = s_i e_i
    s_diag = jnp.stack([s[:, 0, 0], s[:, 1, 1], s[:, 2, 2]], axis=-1)  # [B,3]
    a123 = (pts3d - c0) / s_diag[:, None, :]  # [B,N,3]
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)  # [B,N,4]


def _build_M(alphas, pts2d_norm):
    """Constraint normal matrix M^T M [B, 12, 12].

    ``pts2d_norm`` are NORMALIZED camera coordinates ((u - cx)/fx, ...): the
    unit-focal formulation keeps every entry O(alpha), so the normal matrix
    is well-conditioned in float32 (the pixel-space version has a ~1e7
    trace that swamps the null eigenvalue under regularization).
    """
    b, n, _ = alphas.shape
    u = pts2d_norm[..., 0]  # [B,N]
    v = pts2d_norm[..., 1]
    zeros = jnp.zeros_like(alphas)
    ru = jnp.stack([alphas, zeros, alphas * (-u)[..., None]], axis=-1)  # [B,N,4,3]
    rv = jnp.stack([zeros, alphas, alphas * (-v)[..., None]], axis=-1)
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


def _quat_to_matrix(q):
    """Unit quaternion (w, x, y, z) [B, 4] -> rotation matrices [B, 3, 3]."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def _procrustes(pts_w, pts_c, iters=30):
    """Rigid transform (R, t) minimizing ||R pts_w + t - pts_c||.

    Horn's quaternion method: the optimal rotation is the dominant
    eigenvector of a 4x4 symmetric matrix built from the cross-covariance,
    found here by shifted power iteration (fixed count) instead of the
    reference path's SVD — no QR while_loops, and a proper rotation by
    construction (no reflection fix-up needed).
    """
    cw = jnp.mean(pts_w, axis=1, keepdims=True)
    cc = jnp.mean(pts_c, axis=1, keepdims=True)
    S = jnp.einsum("bni,bnj->bij", pts_w - cw, pts_c - cc)  # [B,3,3]
    Sxx, Sxy, Sxz = S[:, 0, 0], S[:, 0, 1], S[:, 0, 2]
    Syx, Syy, Syz = S[:, 1, 0], S[:, 1, 1], S[:, 1, 2]
    Szx, Szy, Szz = S[:, 2, 0], S[:, 2, 1], S[:, 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )  # [B,4,4]
    # Gershgorin shift makes the dominant eigenvalue of (N + s I) the
    # largest eigenvalue of N, so plain power iteration converges to it.
    s = jnp.max(jnp.sum(jnp.abs(N), axis=-1), axis=-1)[:, None, None]
    Ns = N + s * jnp.eye(4, dtype=N.dtype)[None]
    q = jnp.full((N.shape[0], 4), 0.5, N.dtype)

    def body(_, q):
        q = jnp.einsum("bij,bj->bi", Ns, q)
        return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)

    q = jax.lax.fori_loop(0, iters, body, q, unroll=6)
    R = _quat_to_matrix(q)
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
def epnp_candidates(pts2d, pts3d, K):
    """EPnP candidate poses from the beta N=1 and N=2 cases.

    Args:
      pts2d: [B, N, 2] pixel coordinates (x, y).
      pts3d: [B, N, 3] model-frame points.
      K: [3, 3] intrinsics (shared across batch).
    Returns:
      ((R1, t1), (R2, t2)) — both candidates; the refinement stage starts
      from each and keeps the better optimum.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    ctrl_w = _control_points(pts3d)
    alphas = _barycentric(pts3d, ctrl_w)
    pts2d_norm = (pts2d - jnp.asarray([cx, cy], pts2d.dtype)) / jnp.asarray([fx, fy], pts2d.dtype)
    MtM = _build_M(alphas, pts2d_norm)
    v_min, v_2nd = _smallest_eigvecs2(MtM)

    # Beta case N=1: smallest eigenvector alone.
    R1, t1 = _pose_from_null(v_min, alphas, pts3d, ctrl_w)

    # Beta case N=2: distance constraints on beta1 * v1 + beta2 * v2.
    v1 = v_min.reshape(-1, 4, 3)
    v2 = v_2nd.reshape(-1, 4, 3)
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
    # Batched least squares via damped normal equations with a closed-form
    # 3x3 inverse (adjugate) — no LU.
    AtA = jnp.einsum("bij,bik->bjk", A, A)
    AtA = AtA + 1e-8 * jnp.trace(AtA, axis1=1, axis2=2)[:, None, None] * jnp.eye(3, dtype=A.dtype)
    Atr = jnp.einsum("bij,bik->bjk", A, rhs)[..., 0]  # [B,3]
    sol = jnp.einsum("bij,bj->bi", _inv3x3(AtA), Atr)  # [B,3] = [b11, b12, b22]
    b1 = jnp.sqrt(jnp.maximum(sol[:, 0], 1e-12))
    b2_mag = jnp.sqrt(jnp.maximum(sol[:, 2], 1e-12))
    b2 = jnp.where(sol[:, 1] < 0, -b2_mag, b2_mag)
    vker2 = (b1[:, None, None] * v1 + b2[:, None, None] * v2).reshape(-1, 12)
    R2, t2 = _pose_from_null(vker2, alphas, pts3d, ctrl_w)
    return (R1, t1), (R2, t2)


@f32_precision
def epnp(pts2d, pts3d, K):
    """EPnP pose estimate (best of the beta N=1 / N=2 cases)."""
    (R1, t1), (R2, t2) = epnp_candidates(pts2d, pts3d, K)
    e1 = _reproj_sq_err(pts2d, pts3d, K, R1, t1)
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


def _lm_step(state, pts2d, pts3d, K):
    """One Levenberg-Marquardt step with accept/reject (branch-free).

    state = (p6d [6], lam scalar). Rejected steps raise the damping and keep
    the old iterate, which keeps the solve robust from weak EPnP inits —
    the on-device analogue of cv2's SOLVEPNP_ITERATIVE LM loop.
    """
    p6d, lam = state

    def f(p):
        return (_residuals(p, pts3d, K) - pts2d).reshape(-1)

    r = f(p6d)
    err = jnp.sum(jnp.square(r))
    J = jax.jacfwd(f)(p6d)  # [2N, 6]
    JtJ = J.T @ J
    Jtr = J.T @ r
    H = JtJ + lam * jnp.eye(6, dtype=p6d.dtype) * (1.0 + jnp.diag(JtJ))
    delta = _cholesky_solve_spd(H, Jtr)
    delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
    p_new = p6d - delta
    err_new = jnp.sum(jnp.square(f(p_new)))
    accept = jnp.isfinite(err_new) & (err_new < err)
    p6d = jnp.where(accept, p_new, p6d)
    lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12), jnp.minimum(lam * 5.0, 1e6))
    return p6d, lam


def _refine(p6d0, pts2d, pts3d, K, iterations):
    def body(_, state):
        return jax.vmap(_lm_step, in_axes=((0, 0), 0, 0, None))(state, pts2d, pts3d, K)

    lam0 = jnp.full((p6d0.shape[0],), 1e-4, p6d0.dtype)
    p6d, _ = jax.lax.fori_loop(0, iterations, body, (p6d0, lam0))
    return p6d


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

    import os

    backend_choice = os.environ.get("CASAPOSE_PNP_REFINE", "pallas")
    if jax.default_backend() not in ("cpu",) and backend_choice == "pallas":
        # Fully-fused Pallas kernel: EPnP init + both-candidate LM refine in
        # ONE kernel launch (the XLA path issues thousands of tiny kernels;
        # see ops/pnp_kernel.py).
        from casapose_tpu.ops.pnp_kernel import solve_pnp_pallas

        R_fin, t_fin, _ = solve_pnp_pallas(safe_pts2d, pts3d, K, iterations=iterations)
        R_fin = jnp.where(jnp.isfinite(R_fin), R_fin, jnp.eye(3, dtype=dtype)[None])
        t_fin = jnp.where(jnp.isfinite(t_fin), t_fin, jnp.asarray([0.0, 0.0, 1.0], dtype))
        p6d = jnp.concatenate([rotation_to_rvec(R_fin), t_fin], axis=1)
    else:
        (R1, t1), (R2, t2) = epnp_candidates(safe_pts2d, pts3d, K)

        def to_p6d(R, t):
            p = jnp.concatenate([rotation_to_rvec(R), t], axis=1)
            tz = p[:, 5:6]
            p = jnp.concatenate([p[:, :5], jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)], axis=1)
            return jnp.where(jnp.isfinite(p), p, 0.0)

        # LM-refine from both EPnP beta cases in ONE doubled batch
        # (sequential LM trips are the latency driver).
        pts2d_2 = jnp.concatenate([safe_pts2d, safe_pts2d], axis=0)
        pts3d_2 = jnp.concatenate([pts3d, pts3d], axis=0)
        p0 = jnp.concatenate([to_p6d(R1, t1), to_p6d(R2, t2)], axis=0)  # [2B, 6]
        refined = _refine(p0, pts2d_2, pts3d_2, K, iterations)
        pa, pb = refined[:b], refined[b:]

        def final_err(p):
            r = jax.vmap(_residuals, in_axes=(0, 0, None))(p, pts3d, K) - safe_pts2d
            return jnp.sum(jnp.square(r), axis=(1, 2))

        use_a = (final_err(pa) <= final_err(pb))[:, None]
        p6d = jnp.where(use_a, pa, pb)
    p6d = jnp.where(jnp.isfinite(p6d), p6d, 0.0)
    return jnp.where(degenerate[:, None], placeholder, p6d)


def pose_matrix_from_p6d(p6d):
    """[B, 6] -> [B, 3, 4] with the reference's t_z sign fix applied."""
    R = rodrigues(p6d[:, 0:3])
    t = p6d[:, 3:6][..., None]
    RT = jnp.concatenate([R, t], axis=-1)
    return jnp.where(t[:, 2:3] < 0, -RT, RT)
