"""Fused Pallas LM refinement kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from casapose_tpu.ops.pnp_kernel import lm_refine_pallas

K = np.array([[572.4, 0, 325.26], [0, 573.57, 242.05], [0, 0, 1]], np.float32)


def _make(B=8, N=9, seed=0, init_rot_noise=0.2, init_t_noise=0.05, px_noise=0.0):
    rng = np.random.default_rng(seed)
    pts3d = rng.uniform(-0.06, 0.06, (B, N, 3)).astype(np.float32)
    R_gt = Rotation.random(B, random_state=seed + 1).as_matrix().astype(np.float32)
    t_gt = np.stack(
        [rng.uniform(-0.1, 0.1, B), rng.uniform(-0.1, 0.1, B), rng.uniform(0.5, 1.2, B)], 1
    ).astype(np.float32)
    cam = np.einsum("bij,bnj->bni", R_gt, pts3d) + t_gt[:, None]
    uv = cam @ K.T
    pts2d = (uv[..., :2] / uv[..., 2:]).astype(np.float32)
    if px_noise:
        pts2d = (pts2d + rng.normal(scale=px_noise, size=pts2d.shape)).astype(np.float32)
    R0 = Rotation.from_rotvec(
        Rotation.from_matrix(R_gt).as_rotvec() + rng.normal(scale=init_rot_noise, size=(B, 3))
    ).as_matrix().astype(np.float32)
    t0 = (t_gt + rng.normal(scale=init_t_noise, size=(B, 3))).astype(np.float32)
    return pts2d, pts3d, R_gt, t_gt, R0, t0


@pytest.mark.slow
def test_lm_kernel_converges_exact():
    pts2d, pts3d, R_gt, t_gt, R0, t0 = _make()
    R, t, err = lm_refine_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K),
        iterations=12, interpret=True,
    )
    assert float(jnp.max(err)) < 1e-6
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-5)


@pytest.mark.slow
def test_lm_kernel_noisy_matches_xla_refine():
    """The kernel and the XLA LM path must find the same optimum."""
    from casapose_tpu.pose.epnp import _refine
    from casapose_tpu.pose.geometry import rotation_to_rvec

    pts2d, pts3d, _, _, R0, t0 = _make(px_noise=1.0, seed=3)
    R, t, err = lm_refine_pallas(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K),
        iterations=15, interpret=True,
    )
    p0 = jnp.concatenate([rotation_to_rvec(jnp.asarray(R0)), jnp.asarray(t0)], axis=1)
    p_ref = _refine(p0, jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K), 15)
    np.testing.assert_allclose(np.asarray(t), np.asarray(p_ref[:, 3:6]), atol=2e-4)


def test_lm_kernel_stationary_at_optimum():
    pts2d, pts3d, R_gt, t_gt, _, _ = _make(seed=5)
    R, t, err = lm_refine_pallas(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K),
        iterations=5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-6)
