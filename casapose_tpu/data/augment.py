"""Host-side photometric augmentation (numpy + cv2).

Distribution-equivalent rebuild of the reference's imgaug pipelines
(casapose/data_handler/augmentation_model.py): the same augmenter families
(blur, hue/saturation, additive/multiplicative brightness, gamma / sigmoid /
log / linear contrast, pixel noise) with the same parameter ranges and
activation probabilities, implemented directly on uint8 numpy arrays. The
exact random draws differ from imgaug (different PRNG), which only changes
the sampled augmentation stream, not its distribution.
"""

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _maybe_per_channel(rng, shape_c, lo, hi, per_channel_p=0.5):
    if rng.uniform() < per_channel_p:
        return rng.uniform(lo, hi, size=(1, 1, shape_c)).astype(np.float32)
    return np.float32(rng.uniform(lo, hi))


def _blur(img, rng):
    choice = rng.integers(0, 5)
    if cv2 is None:
        return img
    if choice == 0:
        sigma = rng.uniform(0.0, 2.0)
        if sigma < 1e-3:
            return img
        return cv2.GaussianBlur(img, (0, 0), sigma)
    k = int(rng.integers(1, 4)) * 2 + 1  # 3,5,7
    if choice == 1:
        return cv2.blur(img, (k, k))
    if choice == 2:
        return cv2.medianBlur(img, k)
    if choice == 3:  # motion blur
        kernel = np.zeros((k, k), np.float32)
        angle = rng.uniform(0, 180)
        c = (k - 1) / 2
        dx, dy = np.cos(np.deg2rad(angle)), np.sin(np.deg2rad(angle))
        for t in np.linspace(-c, c, k * 2):
            x, y = int(round(c + t * dx)), int(round(c + t * dy))
            if 0 <= x < k and 0 <= y < k:
                kernel[y, x] = 1
        kernel /= max(kernel.sum(), 1)
        return cv2.filter2D(img, -1, kernel)
    d = int(rng.integers(1, 8))
    return cv2.bilateralFilter(img, d, 75, 75)


def _add_to_hue_saturation(img, rng, lo=-15, hi=15):
    if cv2 is None or img.shape[-1] != 3:
        return img
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(rng.uniform(lo, hi) * 180 / 255)) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] + int(rng.uniform(lo, hi)), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _brightness(img, rng):
    c = img.shape[-1]
    x = img.astype(np.float32)
    choice = rng.integers(0, 3)
    if choice in (0, 1):
        x = x + _maybe_per_channel(rng, c, -10, 10)
    if choice in (0, 2):
        x = x * _maybe_per_channel(rng, c, 0.75, 1.25)
    return np.clip(x, 0, 255).astype(np.uint8)


def _contrast(img, rng):
    c = img.shape[-1]
    x = img.astype(np.float32) / 255.0
    choice = rng.integers(0, 4)
    if choice == 0:  # gamma
        x = np.power(np.clip(x, 1e-6, 1.0), _maybe_per_channel(rng, c, 0.75, 1.25))
    elif choice == 1:  # sigmoid
        gain = _maybe_per_channel(rng, c, 5, 10)
        cutoff = np.float32(rng.uniform(0.25, 0.75))
        x = 1.0 / (1.0 + np.exp(gain * (cutoff - x)))
    elif choice == 2:  # log
        gain = _maybe_per_channel(rng, c, 0.75, 1.0)
        x = gain * np.log2(1.0 + x)
    else:  # linear
        alpha = _maybe_per_channel(rng, c, 0.7, 1.3)
        x = 0.5 + alpha * (x - 0.5)
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def _noise(img, rng):
    c = img.shape[-1]
    x = img.astype(np.float32)
    choice = rng.integers(0, 5)
    if choice == 0:
        scale = rng.uniform(0, 0.05) * 255
        per_c = rng.uniform() < 0.5
        n = rng.normal(0, max(scale, 1e-6), size=img.shape if per_c else img.shape[:2] + (1,))
        x = x + n
    elif choice == 1:
        scale = rng.uniform(0, 0.05) * 255
        n = rng.laplace(0, max(scale, 1e-6), size=img.shape)
        x = x + n
    elif choice == 2:
        lam = rng.uniform(0, 8)
        x = x + rng.poisson(lam, size=img.shape) - lam
    elif choice == 3:  # dropout
        p = rng.uniform(0, 0.05)
        x = x * (rng.uniform(size=img.shape[:2] + (1,)) >= p)
    else:  # salt & pepper
        p = rng.uniform(0, 0.05)
        m = rng.uniform(size=img.shape[:2])
        x = np.where((m < p / 2)[..., None], 0.0, x)
        x = np.where((m > 1 - p / 2)[..., None], 255.0, x)
    return np.clip(x, 0, 255).astype(np.uint8)


def augment_image(img, rng=None, color=True):
    """Apply the PyraPose-style photometric pipeline to one uint8 image."""
    if rng is None:
        rng = np.random.default_rng()
    stages = []
    n_blur = rng.integers(0, 3)
    for _ in range(n_blur):
        stages.append(_blur)
    if color and rng.uniform() < 0.5:
        stages.append(_add_to_hue_saturation)
    stages.append(_brightness)  # OneOf: always one brightness op
    for _ in range(rng.integers(0, 3)):
        stages.append(_contrast)
    for _ in range(rng.integers(0, 4)):
        stages.append(_noise)
    order = rng.permutation(len(stages))
    for i in order:
        img = stages[i](img, rng)
    return img


def augment_batch(images, rng=None, color=True):
    """Augment a uint8 batch [b, h, w, c] independently per image."""
    if rng is None:
        rng = np.random.default_rng()
    return np.stack([augment_image(images[i], rng, color=color) for i in range(len(images))])
