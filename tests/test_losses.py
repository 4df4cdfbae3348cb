"""Loss functions vs. hand-computed / numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casapose_tpu.losses.losses import (
    LossWeights,
    composite_loss,
    keypoint_reprojection_loss,
    proxy_voting_dist,
    proxy_voting_loss,
    smooth_l1_loss,
)


def test_smooth_l1_basic():
    pred = jnp.asarray(np.array([[[[0.5, 2.0]]]], np.float32))  # b=1,h=1,w=1,c=2
    tgt = jnp.zeros((1, 1, 1, 2), jnp.float32)
    w = jnp.ones((1, 1, 1, 1), jnp.float32)
    # |0.5| -> 0.125 ; |2.0| -> 1.5 ; sum = 1.625 ; / (2 * 1 + 1e-3)
    out = float(smooth_l1_loss(pred, tgt, w))
    np.testing.assert_allclose(out, 1.625 / (2 * 1 + 1e-3), rtol=1e-6)


def test_smooth_l1_invert_weights():
    pred = jnp.ones((1, 2, 2, 2), jnp.float32)
    tgt = jnp.zeros((1, 2, 2, 2), jnp.float32)
    bg = jnp.asarray(np.array([[[[1], [0]], [[0], [1]]]], np.float32))  # bg mask
    out = float(smooth_l1_loss(pred, tgt, bg, invert_weights=True))
    # two foreground pixels, each contributing 2 * 0.5
    np.testing.assert_allclose(out, 2.0 / (2 * 2 + 1e-3), rtol=1e-5)


def _proxy_case():
    """One object covering 2 pixels, perfect directions to one keypoint."""
    b, h, w, k = 1, 4, 4, 2
    oc = 1
    seg = np.zeros((b, h, w, 1 + oc), np.float32)
    seg[..., 0] = 1.0
    seg[0, 1, 1] = [0, 1]
    seg[0, 2, 2] = [0, 1]
    kp = np.array([[[[[3.0, 3.0], [0.5, 0.5]]]]], np.float32)  # [b, oc, ic=1, k, 2] (y,x)
    dirs = np.zeros((b, h, w, k * 2), np.float32)
    for (y, x) in [(1, 1), (2, 2)]:
        for ki in range(k):
            v = kp[0, 0, 0, ki] - np.array([y + 0.5, x + 0.5])
            v = v / np.linalg.norm(v)
            dirs[0, y, x, 2 * ki : 2 * ki + 2] = v
    return seg, kp, dirs


def test_proxy_voting_zero_for_perfect_directions():
    seg, kp, dirs = _proxy_case()
    out = float(
        proxy_voting_loss(
            jnp.asarray(dirs),
            jnp.asarray(kp),
            vertex_one_hot_weights=jnp.asarray(seg[..., 1:]),
            vertex_weights=jnp.asarray(seg[..., 0:1]),
            invert_weights=True,
        )
    )
    assert out < 1e-6


def test_proxy_voting_dist_detects_bad_object():
    seg, kp, dirs = _proxy_case()
    bad = dirs.copy()
    # Perpendicular directions => distance ~= distance to keypoint.
    bad[0, 1, 1, 0:2] = [bad[0, 1, 1, 1], -bad[0, 1, 1, 0]]
    bad[0, 2, 2, 0:2] = [bad[0, 2, 2, 1], -bad[0, 2, 2, 0]]
    dist, per_obj = proxy_voting_dist(
        jnp.asarray(bad),
        jnp.asarray(kp),
        vertex_one_hot_weights=jnp.asarray(seg[..., 1:]),
        vertex_weights=jnp.asarray(seg[..., 0:1]),
        invert_weights=True,
        min_object_pixel=1,
    )
    assert float(jnp.max(dist)) > 0.3
    assert np.asarray(per_obj).shape == (1, 1)
    assert float(per_obj[0, 0]) > 0.0


def _kp_loss_setup(estimate_poses=False, use_bpnp=False, conf_reg=False):
    rng = np.random.default_rng(0)
    b, oc, ic, vc = 1, 2, 1, 9
    h = w = 32
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32)
    pts3d = rng.uniform(-0.05, 0.05, size=(b, oc, ic, vc, 3)).astype(np.float32)
    poses_gt = np.zeros((b, oc, ic, 3, 4), np.float32)
    poses_gt[..., :3, :3] = np.eye(3)
    poses_gt[..., 2, 3] = 0.8
    # GT projections in original image space
    proj = np.einsum("bocij,bocvj->bocvi", poses_gt[..., :3], pts3d) + poses_gt[..., None, :, 3]
    uv = proj @ K.T
    xy = uv[..., :2] / uv[..., 2:]
    # offsets: identity augmentation
    offsets = np.array([[0, 0, h, w, 0, 0, 0, 1.0, w, h]], np.float32)
    # voted points in (y, x) network space == (y, x) original space here
    points = xy[..., ::-1][:, :, 0]  # [b, oc, vc, 2]
    target_seg = np.zeros((b, h, w, 1 + oc), np.float32)
    target_seg[..., 0] = 1
    target_seg[0, 2:12, 2:12] = [0, 1, 0]
    target_seg[0, 18:30, 18:30] = [0, 0, 1]
    seg_logits = target_seg * 10.0
    conf = rng.normal(size=(b, h, w, vc)).astype(np.float32)
    cam = np.tile(K[None], (b, 1, 1))
    return dict(
        points_estimated=jnp.asarray(points),
        seg_estimated=jnp.asarray(seg_logits),
        poses_gt=jnp.asarray(poses_gt),
        object_points_3d=jnp.asarray(pts3d),
        target_seg=jnp.asarray(target_seg),
        camera_data=jnp.asarray(cam),
        offsets=jnp.asarray(offsets),
        confidence=jnp.asarray(conf),
        min_num=20,
        use_bpnp_reprojection_loss=use_bpnp,
        estimate_poses=estimate_poses,
        confidence_regularization=conf_reg,
    )


def test_keypoint_reprojection_loss_zero_for_exact_points():
    out, poses, pts = keypoint_reprojection_loss(**_kp_loss_setup())
    assert float(out) < 1e-4
    assert poses is None


def test_keypoint_reprojection_loss_with_pose_estimation():
    out, poses, pts = keypoint_reprojection_loss(**_kp_loss_setup(estimate_poses=True))
    assert poses.shape == (1, 2, 1, 3, 4)
    p = np.asarray(poses)
    # Both objects visible: estimated pose should recover t_z = 0.8.
    np.testing.assert_allclose(p[0, :, 0, 2, 3], 0.8, atol=5e-3)


@pytest.mark.slow
def test_keypoint_reprojection_loss_bpnp_grad_finite():
    setup = _kp_loss_setup(use_bpnp=True, estimate_poses=True, conf_reg=True)

    def f(points):
        setup2 = dict(setup, points_estimated=points)
        loss, _, _ = keypoint_reprojection_loss(**setup2)
        return loss

    g = np.asarray(jax.grad(f)(setup["points_estimated"]))
    assert np.all(np.isfinite(g))


def test_composite_loss_components():
    rng = np.random.default_rng(1)
    b, h, w, oc, k = 2, 8, 8, 2, 3
    seg_t = jax.nn.one_hot(jnp.asarray(rng.integers(0, oc + 1, (b, h, w))), oc + 1)
    seg_o = jnp.asarray(rng.normal(size=(b, h, w, oc + 1)).astype(np.float32))
    vert_o = jnp.asarray(rng.normal(size=(b, h, w, k * 2)).astype(np.float32))
    vert_t = jnp.asarray(rng.normal(size=(b, h, w, k * 2)).astype(np.float32))
    kp = jnp.asarray(rng.uniform(0, 8, (b, oc, 1, k, 2)).astype(np.float32))
    lw = LossWeights(filter_vertex_with_segmentation=True)
    out = composite_loss(seg_o, seg_t, vert_o, vert_t, kp, lw)
    assert len(out) == 5
    total = float(out[0])
    recon = 1.0 * float(out[1]) + 0.5 * float(out[2]) + 0.015 * float(out[3]) + 0.007 * float(out[4])
    np.testing.assert_allclose(total, recon, rtol=1e-5)
    for v in out:
        assert np.isfinite(float(v))


def test_composite_loss_grads_finite():
    rng = np.random.default_rng(2)
    b, h, w, oc, k = 1, 8, 8, 2, 3
    seg_t = jax.nn.one_hot(jnp.asarray(rng.integers(0, oc + 1, (b, h, w))), oc + 1)
    vert_t = jnp.asarray(rng.normal(size=(b, h, w, k * 2)).astype(np.float32))
    kp = jnp.asarray(rng.uniform(0, 8, (b, oc, 1, k, 2)).astype(np.float32))
    lw = LossWeights()

    def f(params):
        seg_o, vert_o = params
        return composite_loss(seg_o, seg_t, vert_o, vert_t, kp, lw)[0]

    seg_o = jnp.asarray(rng.normal(size=(b, h, w, oc + 1)).astype(np.float32))
    vert_o = jnp.asarray(rng.normal(size=(b, h, w, k * 2)).astype(np.float32))
    g = jax.grad(f)((seg_o, vert_o))
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
