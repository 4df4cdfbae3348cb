"""Pallas kernel: fused Levenberg-Marquardt pose refinement.

The LM refinement of :mod:`casapose_tpu.pose.epnp` is numerically tiny
(B <= ~100 detections, 9 points, 6 parameters) but structurally long — tens
of sequential iterations of many small ops. As one XLA program that becomes
thousands of kernel launches (~10us each through this TPU backend, ~30 ms
per batch of 32 detections). This module fuses the ENTIRE refinement —
residuals, analytic Jacobians, normal equations, damped Cholesky solve,
manifold update, and accept/reject — into ONE Pallas kernel with all state
in VMEM.

Mosaic-friendly layout: rotation matrices are a 3x3 Python grid of [B]
vectors, point coordinates are [B, N] vectors, and every contraction (all
over static size 3 or 6) is an unrolled scalar formula — no dot_generals,
no >2D gathers, nothing the TPU lowering cannot handle. The batch rides the
VPU lanes.

Parametrization: the kernel optimizes a LOCAL SO(3) increment delta
(R <- exp(-delta) R) whose Jacobian has the closed form
dXc/ddelta = -skew(R X) — same optimum as a global axis-angle
parametrization, far simpler algebra.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve6(H, g):
    """Unrolled 6x6 Cholesky solve on a grid of [B] entries -> list of 6."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = g[i]
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


def _exp_so3_grid(wx, wy, wz):
    """Rodrigues exp map on [B] components -> 3x3 grid of [B] entries.

    exp(K) = I + a K + b K^2 with K^2 = w w^T - |w|^2 I (matmul-free).
    """
    theta2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-30))
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-30))
    w = [wx, wy, wz]
    K = [[0, -wz, wy], [wz, 0, -wx], [-wy, wx, 0]]
    out = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            eye = 1.0 if i == j else 0.0
            k2 = w[i] * w[j] - (theta2 if i == j else 0.0)
            out[i][j] = eye + a * K[i][j] + b * k2
    return out


def _mat3_mul_grid(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def _lm_body(R, t, lam, X, U, fx, fy, cx, cy):
    """One LM iteration; R = 3x3 grid of [B], t = list of 3 [B],
    X = list of 3 [B, N], U = list of 2 [B, N]."""

    def residuals(R, t):
        # R entries and t are [B, 1]; X/U are [B, N] — plain broadcasting.
        Xc = [R[i][0] * X[0] + R[i][1] * X[1] + R[i][2] * X[2] + t[i] for i in range(3)]
        z = Xc[2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ru = fx * Xc[0] / zs + cx - U[0]
        rv = fy * Xc[1] / zs + cy - U[1]
        return ru, rv, Xc, zs

    ru, rv, Xc, z = residuals(R, t)
    err = jnp.sum(ru * ru + rv * rv, axis=1, keepdims=True)  # [B, 1]

    iz = 1.0 / z
    du0 = fx * iz
    du2 = -fx * Xc[0] * iz * iz
    dv1 = fy * iz
    dv2 = -fy * Xc[1] * iz * iz
    px = Xc[0] - t[0]
    py = Xc[1] - t[1]
    pz = Xc[2] - t[2]
    zero = jnp.zeros_like(du0)
    # J columns (6 params: 3 rotation delta, 3 translation) for u and v rows.
    Ju = [du2 * py, du0 * pz - du2 * px, -du0 * py, du0, zero, du2]
    Jv = [-dv1 * pz + dv2 * py, -dv2 * px, dv1 * px, zero, dv1, dv2]

    H = [[None] * 6 for _ in range(6)]
    g = [None] * 6
    for i in range(6):
        for j in range(i, 6):
            H[i][j] = jnp.sum(Ju[i] * Ju[j] + Jv[i] * Jv[j], axis=1, keepdims=True)
        g[i] = jnp.sum(Ju[i] * ru + Jv[i] * rv, axis=1, keepdims=True)
    for i in range(6):
        for j in range(i):
            H[i][j] = H[j][i]
    for i in range(6):
        H[i][i] = H[i][i] + lam * (1.0 + H[i][i])

    delta = _chol_solve6(H, g)
    delta = [jnp.where(jnp.isfinite(d), d, 0.0) for d in delta]

    dR = _exp_so3_grid(-delta[0], -delta[1], -delta[2])
    R_new = _mat3_mul_grid(dR, R)
    t_new = [t[i] - delta[3 + i] for i in range(3)]
    ru2, rv2, _, _ = residuals(R_new, t_new)
    err_new = jnp.sum(ru2 * ru2 + rv2 * rv2, axis=1, keepdims=True)
    accept = jnp.isfinite(err_new) & (err_new < err)
    R = [[jnp.where(accept, R_new[i][j], R[i][j]) for j in range(3)] for i in range(3)]
    t = [jnp.where(accept, t_new[i], t[i]) for i in range(3)]
    lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12), jnp.minimum(lam * 5.0, 1e6))
    return R, t, lam, jnp.minimum(err, err_new)


def _lm_kernel(iterations, n_pts, kparams_ref, p2_ref, p3_ref, R0_ref, t0_ref, R_out, t_out, err_out):
    fx = kparams_ref[0]
    fy = kparams_ref[1]
    cx = kparams_ref[2]
    cy = kparams_ref[3]
    N = n_pts
    # p3_ref: [B, 3*N] laid out [x0..xN-1, y0.., z0..]; p2_ref: [B, 2*N].
    p3 = p3_ref[:]
    p2 = p2_ref[:]
    X = [p3[:, 0:N], p3[:, N : 2 * N], p3[:, 2 * N : 3 * N]]
    U = [p2[:, 0:N], p2[:, N : 2 * N]]
    R0 = R0_ref[:]  # [B, 9]
    t0 = t0_ref[:]  # [B, 3]
    R = [[R0[:, 3 * i + j : 3 * i + j + 1] for j in range(3)] for i in range(3)]
    t = [t0[:, 0:1], t0[:, 1:2], t0[:, 2:3]]
    B = p3.shape[0]
    lam = jnp.full((B, 1), 1e-4, p3.dtype)
    err = jnp.zeros((B, 1), p3.dtype)
    for _ in range(iterations):
        R, t, lam, err = _lm_body(R, t, lam, X, U, fx, fy, cx, cy)
    R_out[:] = jnp.concatenate([R[i][j] for i in range(3) for j in range(3)], axis=-1)
    t_out[:] = jnp.concatenate(t, axis=-1)
    err_out[:] = err


@partial(jax.jit, static_argnames=("iterations", "interpret"))
def lm_refine_pallas(R0, t0, pts2d, pts3d, K, iterations=10, interpret=False):
    """Fused LM refinement.

    Args:
      R0: [B, 3, 3] initial rotations; t0: [B, 3] initial translations.
      pts2d: [B, N, 2] (x, y) pixel targets; pts3d: [B, N, 3] model points.
      K: [3, 3] intrinsics.
    Returns: (R [B,3,3], t [B,3], err [B]) after ``iterations`` LM steps.
    """
    dtype = pts2d.dtype
    B, N, _ = pts2d.shape
    kparams = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(dtype)
    # Coordinate-major 2D layouts (all kernel arrays are 2D).
    p2 = jnp.concatenate([pts2d[:, :, 0], pts2d[:, :, 1]], axis=1)  # [B, 2N]
    p3 = jnp.concatenate([pts3d[:, :, 0], pts3d[:, :, 1], pts3d[:, :, 2]], axis=1)  # [B, 3N]
    R0f = R0.reshape(B, 9)
    out_shapes = (
        jax.ShapeDtypeStruct((B, 9), dtype),
        jax.ShapeDtypeStruct((B, 3), dtype),
        jax.ShapeDtypeStruct((B, 1), dtype),
    )
    Rf, tf, err = pl.pallas_call(
        partial(_lm_kernel, iterations, N),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(kparams, p2, p3, R0f, t0)
    return Rf.reshape(B, 3, 3), tf, err[:, 0]


# ---------------------------------------------------------------------------
# Full PnP solve (EPnP init + LM refine) as ONE kernel
# ---------------------------------------------------------------------------


def _mean_n(x):
    return jnp.mean(x, axis=1, keepdims=True)  # [B,N] -> [B,1]


def _sum_n(x):
    return jnp.sum(x, axis=1, keepdims=True)


def _chol_factor_grid(A, n):
    """Cholesky factor of an n x n grid of [B,1] entries."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _chol_solve_grid(L, b):
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


def _grid_matvec(A, v, n):
    return [sum(A[i][j] * v[j] for j in range(n)) for i in range(n)]


def _epnp_candidates_grid(X, u, v):
    """EPnP beta-1/beta-2 candidates in scalarized grid form.

    X: list of 3 [B, N] model coordinates; u, v: [B, N] NORMALIZED camera
    coordinates. Returns ((R1, t1), (R2, t2)) as (3x3 grid of [B,1],
    list of 3 [B,1]). Mirrors pose/epnp.py::epnp_candidates.
    """
    # Axis-aligned control points.
    c0 = [_mean_n(X[c]) for c in range(3)]  # [B,1] each
    cent = [X[c] - c0[c] for c in range(3)]
    std = [jnp.sqrt(jnp.maximum(_mean_n(cent[c] * cent[c]), 1e-30)) for c in range(3)]
    mx = jnp.maximum(jnp.maximum(std[0], std[1]), std[2])
    floor = 1e-3 * jnp.maximum(mx, 1e-9)
    s = [jnp.maximum(std[c], floor) for c in range(3)]

    a123 = [cent[c] / s[c] for c in range(3)]  # [B,N]
    a0 = 1.0 - a123[0] - a123[1] - a123[2]
    alpha = [a0] + a123  # 4 x [B,N]

    # M^T M from closed-form reductions (see pose/epnp.py::_build_M).
    q2 = u * u + v * v
    S = [[None] * 4 for _ in range(4)]
    SU = [[None] * 4 for _ in range(4)]
    SV = [[None] * 4 for _ in range(4)]
    SQ = [[None] * 4 for _ in range(4)]
    for a in range(4):
        for b_ in range(a, 4):
            ab = alpha[a] * alpha[b_]
            S[a][b_] = S[b_][a] = _sum_n(ab)
            SU[a][b_] = SU[b_][a] = _sum_n(ab * u)
            SV[a][b_] = SV[b_][a] = _sum_n(ab * v)
            SQ[a][b_] = SQ[b_][a] = _sum_n(ab * q2)
    zero = jnp.zeros_like(S[0][0])
    M = [[zero] * 12 for _ in range(12)]
    for a in range(4):
        for b_ in range(4):
            M[3 * a + 0][3 * b_ + 0] = S[a][b_]
            M[3 * a + 1][3 * b_ + 1] = S[a][b_]
            M[3 * a + 0][3 * b_ + 2] = -SU[a][b_]
            M[3 * a + 2][3 * b_ + 0] = -SU[a][b_]
            M[3 * a + 1][3 * b_ + 2] = -SV[a][b_]
            M[3 * a + 2][3 * b_ + 1] = -SV[a][b_]
            M[3 * a + 2][3 * b_ + 2] = SQ[a][b_]

    # Two smallest eigenvectors: Cholesky inverse subspace iteration.
    trace = sum(M[i][i] for i in range(12))
    Mn = [[M[i][j] + (1e-6 * trace + 1e-30) * (1.0 if i == j else 0.0) for j in range(12)] for i in range(12)]
    L = _chol_factor_grid(Mn, 12)
    w1 = [jnp.full_like(zero, 1.0 + 0.1 * i) for i in range(12)]
    w2 = [jnp.full_like(zero, 2.0 - 0.2 * i) for i in range(12)]
    for _ in range(6):
        w1 = _chol_solve_grid(L, w1)
        w2 = _chol_solve_grid(L, w2)
        n1 = jnp.sqrt(jnp.maximum(sum(x_ * x_ for x_ in w1), 1e-30))
        w1 = [x_ / n1 for x_ in w1]
        d = sum(x_ * y_ for x_, y_ in zip(w1, w2))
        w2 = [y_ - d * x_ for x_, y_ in zip(w1, w2)]
        n2 = jnp.sqrt(jnp.maximum(sum(x_ * x_ for x_ in w2), 1e-30))
        w2 = [x_ / n2 for x_ in w2]
    # Rayleigh-Ritz rotation.
    Aw1 = _grid_matvec(M, w1, 12)
    Aw2 = _grid_matvec(M, w2, 12)
    T11 = sum(a_ * b_ for a_, b_ in zip(w1, Aw1))
    T22 = sum(a_ * b_ for a_, b_ in zip(w2, Aw2))
    T12 = sum(a_ * b_ for a_, b_ in zip(w1, Aw2))
    # Half-angle identities (atan2 is not lowerable in Mosaic):
    # cos(2th) = a/r, sin(2th) = b/r with a = T11-T22, b = 2 T12.
    aa = T11 - T22
    bb = 2.0 * T12
    rr = jnp.sqrt(jnp.maximum(aa * aa + bb * bb, 1e-30))
    cos2 = aa / rr
    cth = jnp.sqrt(jnp.maximum((1.0 + cos2) * 0.5, 0.0))
    sth = jnp.sign(bb) * jnp.sqrt(jnp.maximum((1.0 - cos2) * 0.5, 0.0))
    degenerate_rr = (aa * aa + bb * bb) < 1e-28
    cth = jnp.where(degenerate_rr, 1.0, cth)
    sth = jnp.where(degenerate_rr, 0.0, sth)
    r1 = [cth * a_ + sth * b_ for a_, b_ in zip(w1, w2)]
    r2 = [-sth * a_ + cth * b_ for a_, b_ in zip(w1, w2)]
    Ar1 = _grid_matvec(M, r1, 12)
    Ar2 = _grid_matvec(M, r2, 12)
    e1 = sum(a_ * b_ for a_, b_ in zip(r1, Ar1))
    e2 = sum(a_ * b_ for a_, b_ in zip(r2, Ar2))
    fs = e1 <= e2
    v_min = [jnp.where(fs, a_, b_) for a_, b_ in zip(r1, r2)]
    v_2nd = [jnp.where(fs, b_, a_) for a_, b_ in zip(r1, r2)]

    # World control points: ctrl[0] = c0, ctrl[1+c] = c0 + s_c e_c.
    ctrl_w = [[c0[c] for c in range(3)] for _ in range(4)]
    ctrl_w = [list(row) for row in ctrl_w]
    for c in range(3):
        ctrl_w[1 + c][c] = c0[c] + s[c]

    def pose_from_null(vk):
        """vk: 12 entries [B,1] = camera control points (up to sign/scale)."""
        # Pairwise scale fit.
        num = jnp.zeros_like(zero)
        den = jnp.zeros_like(zero)
        for a in range(4):
            for b_ in range(a + 1, 4):
                dc = [vk[3 * a + c] - vk[3 * b_ + c] for c in range(3)]
                dw = [ctrl_w[a][c] - ctrl_w[b_][c] for c in range(3)]
                ndc = jnp.sqrt(jnp.maximum(sum(x_ * x_ for x_ in dc), 1e-30))
                ndw = jnp.sqrt(jnp.maximum(sum(x_ * x_ for x_ in dw), 1e-30))
                num = num + ndc * ndw
                den = den + ndc * ndc
        beta = num / jnp.maximum(den, 1e-30)
        chat = [vk[i] * beta for i in range(12)]
        # Camera-frame points: pc_c = sum_a alpha_a chat[3a+c]  -> [B,N]
        pc = [sum(alpha[a] * chat[3 * a + c] for a in range(4)) for c in range(3)]
        flip = jnp.where(_mean_n(pc[2]) < 0, -1.0, 1.0)
        pc = [p_ * flip for p_ in pc]
        # Horn Procrustes: S3[i][j] = sum (X_i - X̄_i)(pc_j - p̄c_j)
        xb = [_mean_n(X[c]) for c in range(3)]
        pb = [_mean_n(pc[c]) for c in range(3)]
        S3 = [[_sum_n((X[i] - xb[i]) * (pc[j] - pb[j])) for j in range(3)] for i in range(3)]
        Sxx, Sxy, Sxz = S3[0][0], S3[0][1], S3[0][2]
        Syx, Syy, Syz = S3[1][0], S3[1][1], S3[1][2]
        Szx, Szy, Szz = S3[2][0], S3[2][1], S3[2][2]
        Nq = [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
        shift = None
        for i in range(4):
            row = sum(jnp.abs(Nq[i][j]) for j in range(4))
            shift = row if shift is None else jnp.maximum(shift, row)
        Ns = [[Nq[i][j] + (shift if i == j else 0.0) for j in range(4)] for i in range(4)]
        q = [jnp.full_like(zero, 0.5) for _ in range(4)]
        for _ in range(30):
            q = _grid_matvec(Ns, q, 4)
            nq = jnp.sqrt(jnp.maximum(sum(x_ * x_ for x_ in q), 1e-30))
            q = [x_ / nq for x_ in q]
        qw, qx, qy, qz = q
        R = [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ]
        t = [pb[i] - sum(R[i][j] * xb[j] for j in range(3)) for i in range(3)]
        return R, t

    cand1 = pose_from_null(v_min)

    # Beta case N=2.
    d1n2 = jnp.zeros_like(zero)
    # Build the 3-unknown normal equations over the 6 control-point pairs.
    A00 = A01 = A02 = A11 = A12 = A22 = None
    g0 = g1 = g2 = None
    for a in range(4):
        for b_ in range(a + 1, 4):
            d1c = [v_min[3 * a + c] - v_min[3 * b_ + c] for c in range(3)]
            d2c = [v_2nd[3 * a + c] - v_2nd[3 * b_ + c] for c in range(3)]
            dwc = [ctrl_w[a][c] - ctrl_w[b_][c] for c in range(3)]
            r0 = sum(x_ * x_ for x_ in d1c)
            r1_ = 2.0 * sum(x_ * y_ for x_, y_ in zip(d1c, d2c))
            r2_ = sum(x_ * x_ for x_ in d2c)
            rhs = sum(x_ * x_ for x_ in dwc)

            def acc(cur, val):
                return val if cur is None else cur + val

            A00 = acc(A00, r0 * r0)
            A01 = acc(A01, r0 * r1_)
            A02 = acc(A02, r0 * r2_)
            A11 = acc(A11, r1_ * r1_)
            A12 = acc(A12, r1_ * r2_)
            A22 = acc(A22, r2_ * r2_)
            g0 = acc(g0, r0 * rhs)
            g1 = acc(g1, r1_ * rhs)
            g2 = acc(g2, r2_ * rhs)
    trA = A00 + A11 + A22
    A00 = A00 + 1e-8 * trA
    A11 = A11 + 1e-8 * trA
    A22 = A22 + 1e-8 * trA
    # Closed-form 3x3 solve (adjugate).
    c00 = A11 * A22 - A12 * A12
    c01 = A02 * A12 - A01 * A22
    c02 = A01 * A12 - A02 * A11
    c11 = A00 * A22 - A02 * A02
    c12 = A01 * A02 - A00 * A12
    c22 = A00 * A11 - A01 * A01
    det = A00 * c00 + A01 * c01 + A02 * c02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    b11 = (c00 * g0 + c01 * g1 + c02 * g2) / det
    b12 = (c01 * g0 + c11 * g1 + c12 * g2) / det
    b22 = (c02 * g0 + c12 * g1 + c22 * g2) / det
    bb1 = jnp.sqrt(jnp.maximum(b11, 1e-12))
    bb2m = jnp.sqrt(jnp.maximum(b22, 1e-12))
    bb2 = jnp.where(b12 < 0, -bb2m, bb2m)
    vker2 = [bb1 * v_min[i] + bb2 * v_2nd[i] for i in range(12)]
    cand2 = pose_from_null(vker2)
    return cand1, cand2


def _full_pnp_kernel(iterations, n_pts, kparams_ref, p2_ref, p3_ref, R_out, t_out, err_out):
    fx = kparams_ref[0]
    fy = kparams_ref[1]
    cx = kparams_ref[2]
    cy = kparams_ref[3]
    N = n_pts
    p3 = p3_ref[:]
    p2 = p2_ref[:]
    X = [p3[:, 0:N], p3[:, N : 2 * N], p3[:, 2 * N : 3 * N]]
    U = [p2[:, 0:N], p2[:, N : 2 * N]]
    u_norm = (U[0] - cx) / fx
    v_norm = (U[1] - cy) / fy

    (R1, t1), (R2, t2) = _epnp_candidates_grid(X, u_norm, v_norm)

    B = p3.shape[0]

    def refine(R, t):
        lam = jnp.full((B, 1), 1e-4, p3.dtype)
        err = jnp.zeros((B, 1), p3.dtype)
        for _ in range(iterations):
            R, t, lam, err = _lm_body(R, t, lam, X, U, fx, fy, cx, cy)
        return R, t, err

    Ra, ta, erra = refine(R1, t1)
    Rb, tb, errb = refine(R2, t2)
    use_a = erra <= errb
    R = [[jnp.where(use_a, Ra[i][j], Rb[i][j]) for j in range(3)] for i in range(3)]
    t = [jnp.where(use_a, ta[i], tb[i]) for i in range(3)]
    err = jnp.minimum(erra, errb)
    R_out[:] = jnp.concatenate([R[i][j] for i in range(3) for j in range(3)], axis=-1)
    t_out[:] = jnp.concatenate(t, axis=-1)
    err_out[:] = err


@partial(jax.jit, static_argnames=("iterations", "interpret"))
def solve_pnp_pallas(pts2d, pts3d, K, iterations=10, interpret=False):
    """Full PnP (EPnP init + LM refine) as ONE fused Pallas kernel.

    Args / returns as :func:`lm_refine_pallas`, but no initial pose needed.
    Degenerate (all-zero) rows are the CALLER's responsibility (see
    pose/epnp.py::solve_pnp, which substitutes a synthetic problem first).
    """
    dtype = pts2d.dtype
    B, N, _ = pts2d.shape
    kparams = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(dtype)
    p2 = jnp.concatenate([pts2d[:, :, 0], pts2d[:, :, 1]], axis=1)
    p3 = jnp.concatenate([pts3d[:, :, 0], pts3d[:, :, 1], pts3d[:, :, 2]], axis=1)
    out_shapes = (
        jax.ShapeDtypeStruct((B, 9), dtype),
        jax.ShapeDtypeStruct((B, 3), dtype),
        jax.ShapeDtypeStruct((B, 1), dtype),
    )
    Rf, tf, err = pl.pallas_call(
        partial(_full_pnp_kernel, iterations, N),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(kparams, p2, p3)
    return Rf.reshape(B, 3, 3), tf, err[:, 0]
