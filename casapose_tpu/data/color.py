"""Device-side color ops matching tf.image semantics exactly.

The reference's non-imgaug augmentation path applies, on the RAW 0..255
float image, batch-level random jitter (vectorfield_dataset.py:261-266):

    img = tf.image.random_hue(img, hue)                    # delta ~ U(-hue, hue)
    img = tf.image.random_saturation(img, 1-s, 1+s)        # factor ~ U(1-s, 1+s)
    img = tf.image.random_brightness(img, brightness)      # delta ~ U(-b, b), RAW scale
    img = tf.image.random_contrast(img, 1-c, 1+c)          # factor ~ U(1-c, 1+c)

Notes on exact semantics (validated against TF in tests/test_color_ops.py):
  * each random op draws ONE scalar for the whole batch;
  * hue rotates the HSV hue channel modulo 1 (value keeps the input scale);
  * saturation multiplies HSV S and clips it to [0, 1];
  * brightness adds the delta on the input scale — on 0..255 images a
    ``brightness=0.2`` config is a +-0.2/255 effect (reference quirk, kept);
  * contrast is per-channel: (x - mean_HW(x_c)) * factor + mean_HW(x_c).

All ops are pure elementwise jnp — they fuse into the normalization under
jit, so the "true hue rotation" costs nothing extra on TPU.
"""

import jax
import jax.numpy as jnp


def rgb_to_hsv(img):
    """[..., 3] RGB (any non-negative scale) -> HSV with V on input scale.

    Matches tf.image.rgb_to_hsv piecewise hue formula.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    c = v - minc
    safe_c = jnp.where(c > 0, c, 1.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img):
    """Inverse of :func:`rgb_to_hsv` (V keeps its scale)."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, delta):
    """tf.image.adjust_hue: rotate hue by ``delta`` (mod 1)."""
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + delta) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def adjust_saturation(img, factor):
    """tf.image.adjust_saturation: scale S, clipped to [0, 1]."""
    hsv = rgb_to_hsv(img)
    s = jnp.clip(hsv[..., 1] * factor, 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([hsv[..., 0], s, hsv[..., 2]], axis=-1))


def adjust_brightness(img, delta):
    """tf.image.adjust_brightness: add delta on the input scale."""
    return img + delta


def adjust_contrast(img, factor):
    """tf.image.adjust_contrast: per-channel (x - mean_HW) * f + mean_HW."""
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return (img - mean) * factor + mean


def random_color_jitter(img, key, hue=0.0, saturation=0.0, brightness=0.0, contrast=0.0, color=True):
    """The reference's non-imgaug jitter: batch-level draws, exact order.

    ``img`` is the RAW 0..255 float batch. Grayscale inputs skip hue and
    saturation (vectorfield_dataset.py:262-264).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if color and hue > 0:
        img = adjust_hue(img, jax.random.uniform(k1, (), minval=-hue, maxval=hue))
    if color and saturation > 0:
        img = adjust_saturation(
            img, jax.random.uniform(k2, (), minval=1.0 - saturation, maxval=1.0 + saturation)
        )
    if brightness > 0:
        img = adjust_brightness(img, jax.random.uniform(k3, (), minval=-brightness, maxval=brightness))
    if contrast > 0:
        img = adjust_contrast(img, jax.random.uniform(k4, (), minval=1.0 - contrast, maxval=1.0 + contrast))
    return img
