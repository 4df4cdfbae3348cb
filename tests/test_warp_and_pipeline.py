"""Device-side warp op and device batch finishing."""

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.data.pipeline import prepare_device_batch
from casapose_tpu.ops.warp import affine_warp


def test_affine_warp_identity():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    t = np.tile(np.array([1, 0, 0, 0, 1, 0, 0, 0], np.float32), (2, 1))
    out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(t)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_affine_warp_translation():
    img = np.zeros((1, 6, 6, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    # dst->src: output (x,y) samples input at (x+1, y). So the bright pixel
    # at src x=3 appears at dst x=2.
    t = np.array([[1, 0, 1, 0, 1, 0, 0, 0]], np.float32)
    out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(t)))
    assert out[0, 2, 2, 0] == 1.0
    assert out[0, 2, 3, 0] == 0.0


def test_affine_warp_matches_cv2_rotation():
    import cv2

    from casapose_tpu.pose.geometry import get_rotation_matrix_2D_np

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (1, 32, 40, 3)).astype(np.float32)
    rm = get_rotation_matrix_2D_np((20.0, 16.0), 20.0)
    m3 = np.eye(3, dtype=np.float32)
    m3[:2] = rm
    out = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(m3[None]), interpolation="bilinear"))
    ref = cv2.warpAffine(img[0], rm, (40, 32), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    # interior pixels match; borders differ by fill convention
    np.testing.assert_allclose(out[0, 4:-4, 4:-4], ref[4:-4, 4:-4], atol=1.0)


def test_prepare_device_batch():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    labels = rng.integers(0, 3, (2, 8, 8, 1)).astype(np.uint8)
    out_img, target_seg = prepare_device_batch(jnp.asarray(img), jnp.asarray(labels), 3)
    out_img = np.asarray(out_img)
    target_seg = np.asarray(target_seg)
    np.testing.assert_allclose(out_img, (img / 255.0 - 0.5) / 0.5, atol=1e-5)
    assert target_seg.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(np.argmax(target_seg, -1), labels[..., 0])
    assert np.all(target_seg.sum(-1) == 1)


def test_prepare_device_batch_with_jitter_finite():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (2, 8, 8, 3)).astype(np.uint8)
    labels = np.zeros((2, 8, 8, 1), np.uint8)
    out_img, _ = prepare_device_batch(
        jnp.asarray(img), jnp.asarray(labels), 2, rng_key=jax.random.PRNGKey(0),
        noise=0.01, brightness=0.1, contrast=0.1, saturation=0.1, hue=0.1, color_jitter=True,
    )
    out = np.asarray(out_img)
    assert np.all(np.isfinite(out))
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_decode_seg_palette_and_rgb_modes(tmp_path):
    """_decode_seg must return class IDS for palette ('P') and RGB masks —
    the cv2 fast path only handles single-channel files; anything else
    falls back to PIL (cv2 would expand palettes to BGR and lose the ids)."""
    import numpy as np
    from PIL import Image

    from casapose_tpu.data.pipeline import _decode_seg

    ids = np.zeros((16, 16), np.uint8)
    ids[2:6, 3:9] = 7
    ids[10:14, 1:5] = 2

    gray = tmp_path / "gray.seg.png"
    Image.fromarray(ids, mode="L").save(gray)
    np.testing.assert_array_equal(_decode_seg(str(gray)), ids)

    pal = tmp_path / "pal.seg.png"
    im = Image.fromarray(ids, mode="P")
    # non-identity palette so a BGR expansion would corrupt the ids
    im.putpalette([min(3 * i + 1, 255) for i in range(256) for _ in range(3)])
    im.save(pal)
    np.testing.assert_array_equal(_decode_seg(str(pal)), ids)

    rgb = tmp_path / "rgb.seg.png"
    arr = np.stack([ids, np.full_like(ids, 99), np.full_like(ids, 55)], axis=-1)
    Image.fromarray(arr, mode="RGB").save(rgb)
    np.testing.assert_array_equal(_decode_seg(str(rgb)), ids)  # channel 0 = R
