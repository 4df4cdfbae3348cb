"""Back-propagatable PnP via the implicit function theorem.

On-device analogue of the reference's BPnP port
(casapose/pose_estimation/bpnp_layers.py:278-359): the forward pass solves
PnP (here: pure-JAX EPnP + Gauss-Newton, see ``casapose_tpu.pose.epnp``
instead of a ``tf.numpy_function`` -> cv2 escape), and the backward pass
differentiates the solution through the stationarity condition of the
reprojection objective

    g(y; x, z, K) = sum_i || proj(y, z_i, K) - x_i ||^2,   f = dg/dy = 0

so  dy/dq = -(df/dy)^+ (df/dq)  for q in {x (2D points), z (3D points), K}.

The reference assembles the same quantities manually with nested
``GradientTape`` jacobians (bpnp_layers.py:139-212); here jax.grad/jacfwd
produce them directly and ``vmap`` batches the whole thing.
"""

import jax
import jax.numpy as jnp

from casapose_tpu.core.numerics import divide_no_nan
from casapose_tpu.pose.epnp import solve_pnp


def _objective(p6d, pts2d, pts3d, K):
    """Reprojection objective for one pose."""
    from casapose_tpu.pose.epnp import _residuals

    r = _residuals(p6d, pts3d, K) - pts2d
    return jnp.sum(jnp.square(r))


_f = jax.grad(_objective, argnums=0)  # stationarity residual [6]


def _ift_vjp_single(g_out, p6d, pts2d, pts3d, K):
    """VJP of one PnP solve via implicit differentiation.

    Args: g_out [6] upstream gradient; returns (d_pts2d [N,2], d_pts3d [N,3],
    d_K [3,3]).
    """
    J_fy = jax.jacfwd(_f, argnums=0)(p6d, pts2d, pts3d, K)  # [6,6]
    J_fx = jax.jacfwd(_f, argnums=1)(p6d, pts2d, pts3d, K)  # [6,N,2]
    J_fz = jax.jacfwd(_f, argnums=2)(p6d, pts2d, pts3d, K)  # [6,N,3]
    J_fK = jax.jacfwd(_f, argnums=3)(p6d, pts2d, pts3d, K)  # [6,3,3]
    # J_fy is the (symmetric) Hessian of the reprojection objective at the
    # optimum; a damped Cholesky solve replaces the reference's pinv (TPU
    # SVD-based pinv lowers to slow while_loops). The rotation and
    # translation blocks have wildly different units (px^2/rad^2 ~ 1e6 vs
    # px^2/m^2 ~ 1e2 at typical scene scale), so trace-proportional
    # damping would swamp the soft translation directions (measured: 30%
    # gradient error vs the exact float64 IFT). Jacobi equilibration makes
    # the damping relative per-direction: <0.01% distortion, verified
    # against the float64 oracle in tests/test_tf_parity_misc.py.
    from casapose_tpu.pose.epnp import _cholesky_solve_spd

    H = 0.5 * (J_fy + J_fy.T)
    d_inv = jax.lax.rsqrt(jnp.clip(jnp.diag(H), 1e-12, None))
    Hn = H * d_inv[:, None] * d_inv[None, :] + 1e-5 * jnp.eye(6, dtype=H.dtype)
    w = -d_inv * _cholesky_solve_spd(Hn, d_inv * g_out)  # [6]
    d_x = jnp.einsum("i,inm->nm", w, J_fx)
    d_z = jnp.einsum("i,inm->nm", w, J_fz)
    d_K = jnp.einsum("i,inm->nm", w, J_fK)
    finite = jnp.all(jnp.isfinite(d_x)) & jnp.all(jnp.isfinite(d_z)) & jnp.all(jnp.isfinite(d_K))
    zero = jnp.zeros
    return (
        jnp.where(finite, d_x, zero(d_x.shape, d_x.dtype)),
        jnp.where(finite, d_z, zero(d_z.shape, d_z.dtype)),
        jnp.where(finite, d_K, zero(d_K.shape, d_K.dtype)),
    )


@jax.custom_vjp
def bpnp_pose(pts2d, pts3d, K):
    """Differentiable batched PnP.

    Args:
      pts2d: [B, N, 2] (x, y) pixel points (all-zero rows -> placeholder).
      pts3d: [B, N, 3] model points.
      K: [3, 3] intrinsics.
    Returns:
      p6d [B, 6] = [rvec | t]; gradients flow to pts2d/pts3d/K via IFT.
    """
    return solve_pnp(pts2d, pts3d, K)


def _bpnp_fwd(pts2d, pts3d, K):
    p6d = solve_pnp(pts2d, pts3d, K)
    return p6d, (p6d, pts2d, pts3d, K)


def _bpnp_bwd(res, g_out):
    p6d, pts2d, pts3d, K = res
    with jax.default_matmul_precision("float32"):
        d_x, d_z, d_K = jax.vmap(_ift_vjp_single, in_axes=(0, 0, 0, 0, None))(g_out, p6d, pts2d, pts3d, K)
    return d_x, d_z, jnp.sum(d_K, axis=0)


bpnp_pose.defvjp(_bpnp_fwd, _bpnp_bwd)


def batch_project_p6d(p6d, pts3d, K):
    """Project [B, N, 3] points with [B, 6] poses; divide-no-nan at z == 0."""
    from casapose_tpu.pose.geometry import rodrigues

    R = rodrigues(p6d[:, 0:3])
    cam = jnp.einsum("bij,bnj->bni", R, pts3d) + p6d[:, None, 3:6]
    uvw = cam @ K.T
    return divide_no_nan(uvw[..., :2], uvw[..., 2:])
