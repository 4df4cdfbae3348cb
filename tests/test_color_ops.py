"""Color-op parity: data/color.py vs tf.image (and colorsys) semantics."""

import colorsys

import numpy as np
import pytest

from casapose_tpu.data.color import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    hsv_to_rgb,
    rgb_to_hsv,
)


def test_hsv_roundtrip_and_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (64, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(rgb))
    back = np.asarray(hsv_to_rgb(hsv))
    np.testing.assert_allclose(back, rgb, atol=1e-3)
    # against colorsys (unit scale)
    for i in range(8):
        r, g, b = (rgb[i] / 255.0).tolist()
        h, s, v = colorsys.rgb_to_hsv(r, g, b)
        ours = np.asarray(rgb_to_hsv(rgb[i] / 255.0))
        np.testing.assert_allclose(ours, [h, s, v], atol=1e-5)


def test_adjust_hue_rotates():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 255, (4, 4, 3)).astype(np.float32)
    out = np.asarray(adjust_hue(rgb, 0.5))
    # value (max channel) is invariant under hue rotation
    np.testing.assert_allclose(out.max(-1), rgb.max(-1), atol=1e-3)
    # rotating by 1.0 is identity
    np.testing.assert_allclose(np.asarray(adjust_hue(rgb, 1.0)), rgb, atol=1e-3)


def test_adjust_contrast_per_channel():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    out = np.asarray(adjust_contrast(img, 2.0))
    mean = img.mean(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(out, (img - mean) * 2.0 + mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adjust_brightness(img, 3.0)), img + 3.0, rtol=1e-6)


@pytest.mark.slow
def test_color_ops_match_tf_image():
    """Exact tf.image parity for hue/saturation/brightness/contrast on the
    raw 0..255 scale the reference jitters at (vectorfield_dataset.py:261-266)."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    for delta in (-0.05, 0.02, 0.49):
        ours = np.asarray(adjust_hue(img, delta))
        theirs = tf.image.adjust_hue(img, delta).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-2)  # tf uses a fused kernel; small fp drift
    for f in (0.8, 1.2):
        ours = np.asarray(adjust_saturation(img, f))
        theirs = tf.image.adjust_saturation(img, f).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-2)
    ours = np.asarray(adjust_brightness(img, 0.2))
    np.testing.assert_allclose(ours, tf.image.adjust_brightness(img, 0.2).numpy(), atol=1e-4)
    ours = np.asarray(adjust_contrast(img, 1.3))
    np.testing.assert_allclose(ours, tf.image.adjust_contrast(img, 1.3).numpy(), atol=1e-2)
