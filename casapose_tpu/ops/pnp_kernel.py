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
