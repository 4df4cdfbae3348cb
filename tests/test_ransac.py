"""RANSAC keypoint voting on synthetic direction fields."""

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.pose.ransac import ransac_voting_layer_all_masks


def _make_field(h, w, mask, kps):
    """Perfect (dy, dx) unit fields pointing at each keypoint."""
    vn = len(kps)
    cy, cx = np.mgrid[0:h, 0:w].astype(np.float32) + 0.5
    field = np.zeros((h, w, vn, 2), np.float32)
    for ki, (ky, kx) in enumerate(kps):
        vy, vx = ky - cy, kx - cx
        nrm = np.sqrt(vy**2 + vx**2) + 1e-9
        field[..., ki, 0] = np.where(mask, vy / nrm, 0)
        field[..., ki, 1] = np.where(mask, vx / nrm, 0)
    return field


def test_ransac_recovers_keypoints():
    h, w = 64, 64
    mask = np.zeros((h, w), bool)
    mask[10:40, 15:50] = True
    kps = [(20.0, 30.0), (5.0, 55.0), (50.0, 10.0)]
    field = _make_field(h, w, mask, kps)
    masks = mask[None, :, :, None].astype(np.float32)
    pts = np.asarray(
        ransac_voting_layer_all_masks(
            jnp.asarray(masks), jnp.asarray(field[None]), 128, max_num=2048, rng_key=jax.random.PRNGKey(0)
        )
    )
    # output is (x, y)
    for ki, (ky, kx) in enumerate(kps):
        np.testing.assert_allclose(pts[0, 0, ki], [kx, ky], atol=0.5)


def test_ransac_with_outliers():
    h, w = 64, 64
    rng = np.random.default_rng(0)
    mask = np.zeros((h, w), bool)
    mask[8:56, 8:56] = True
    kps = [(30.0, 30.0), (12.0, 40.0)]
    field = _make_field(h, w, mask, kps)
    # corrupt 20% of foreground directions
    corrupt = (rng.uniform(size=(h, w)) < 0.2) & mask
    noise = rng.normal(size=(h, w, len(kps), 2)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=-1, keepdims=True) + 1e-9
    field = np.where(corrupt[..., None, None], noise, field)
    masks = mask[None, :, :, None].astype(np.float32)
    pts = np.asarray(
        ransac_voting_layer_all_masks(
            jnp.asarray(masks), jnp.asarray(field[None]), 256, max_num=4096, rng_key=jax.random.PRNGKey(1)
        )
    )
    for ki, (ky, kx) in enumerate(kps):
        np.testing.assert_allclose(pts[0, 0, ki], [kx, ky], atol=1.5)


def test_ransac_empty_mask_returns_zero():
    h, w = 32, 32
    masks = np.zeros((1, h, w, 2), np.float32)
    masks[0, 10:20, 10:20, 0] = 1.0  # class 0 present, class 1 empty
    field = _make_field(h, w, masks[0, :, :, 0] > 0, [(15.0, 15.0)])
    pts = np.asarray(
        ransac_voting_layer_all_masks(
            jnp.asarray(masks), jnp.asarray(field[None]), 64, max_num=1024, rng_key=jax.random.PRNGKey(2)
        )
    )
    np.testing.assert_allclose(pts[0, 1], 0.0, atol=1e-6)  # empty class
    np.testing.assert_allclose(pts[0, 0, 0], [15.0, 15.0], atol=0.5)


def test_ransac_adaptive_confidence_gating():
    """Adaptive-confidence semantics (ransac_voting.py:318-347): on a clean
    field the first round already clears the confidence threshold, so extra
    rounds must not change the result; with confidence=1.0 (never reached)
    all rounds contribute and accuracy is at least as good."""
    h, w = 64, 64
    mask = np.zeros((h, w), bool)
    mask[10:40, 15:50] = True
    kps = [(20.0, 30.0), (5.0, 55.0)]
    field = _make_field(h, w, mask, kps)
    masks = jnp.asarray(mask[None, :, :, None].astype(np.float32))
    vf = jnp.asarray(field[None])
    key = jax.random.PRNGKey(3)

    one = np.asarray(ransac_voting_layer_all_masks(masks, vf, 128, max_iter=1, max_num=2048, rng_key=key))
    gated = np.asarray(ransac_voting_layer_all_masks(masks, vf, 128, max_iter=8, max_num=2048, rng_key=key))
    # clean field: round 1 wins and clears 0.99 confidence -> rounds 2..8
    # are frozen, so the refined result equals the single-round result
    np.testing.assert_allclose(gated, one, atol=1e-4)

    ungated = np.asarray(
        ransac_voting_layer_all_masks(masks, vf, 128, max_iter=8, max_num=2048, confidence=1.0, rng_key=key)
    )
    err_one = np.abs(one[0, 0] - np.asarray([[30.0, 20.0], [55.0, 5.0]])).max()
    err_ungated = np.abs(ungated[0, 0] - np.asarray([[30.0, 20.0], [55.0, 5.0]])).max()
    assert err_ungated <= err_one + 0.25
