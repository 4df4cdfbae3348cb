"""Distribution tests for the photometric augmentation families.

Pins the family/probability tables against the reference's imgaug pipelines
(reference casapose/data_handler/augmentation_model.py): ``seq_grayscale``
(lines 7-21) is 4 blurs at p=0.2 + Add/Multiply/Gamma/Log/Linear at p=0.5,
NO noise stage and NO sigmoid; the color ``seq`` (lines 46-112) includes the
FrequencyNoiseAlpha brightness member (lines 78-82). Beyond the literal
table, activation rates are measured empirically so the gating machinery —
not just the table constants — is what's verified.
"""

import numpy as np
import pytest

from casapose_tpu.data import augment
from casapose_tpu.data.augment import (
    GRAYSCALE_FAMILY,
    _frequency_noise_alpha,
    augment_image,
)


def test_grayscale_family_table_matches_reference():
    """The (op, p) table must be exactly seq_grayscale's: 4 blur kinds at
    p=0.2, then Add/Multiply/Gamma/Log/Linear contrast at p=0.5 — no noise
    members, no sigmoid contrast, no hue/saturation op."""
    names = [fn.__name__ for fn, _ in GRAYSCALE_FAMILY]
    probs = [p for _, p in GRAYSCALE_FAMILY]
    assert names == [
        "_gaussian_blur",
        "_average_blur",
        "_median_blur",
        "_motion_blur",
        "_add",
        "_multiply",
        "_gamma_contrast",
        "_log_contrast",
        "_linear_contrast",
    ]
    assert probs == [0.2, 0.2, 0.2, 0.2, 0.5, 0.5, 0.5, 0.5, 0.5]
    for banned in ("noise", "sigmoid", "hue", "salt", "pepper", "dropout"):
        assert not any(banned in n for n in names), f"{banned} op leaked into grayscale family"


def test_grayscale_constant_image_stays_spatially_flat():
    """seq_grayscale has NO noise stage: every grayscale-augmented constant
    image must stay spatially constant per channel (blur of a constant is
    constant; add/multiply/contrast are global maps). Any noise op leaking
    into the family — the round-3 defect — fails this immediately."""
    rng = np.random.default_rng(0)
    img = np.full((24, 32, 3), 113, np.uint8)
    for _ in range(200):
        out = augment_image(img, rng, color=False)
        assert out.shape == img.shape and out.dtype == np.uint8
        for c in range(out.shape[-1]):
            assert out[..., c].min() == out[..., c].max(), "spatial variation => noise op in grayscale family"


def test_grayscale_activation_rates(monkeypatch):
    """Empirical per-stage activation frequency over N images must match the
    declared probabilities (binomial 4-sigma band) — verifies the gating
    machinery actually uses the table."""
    counts = {i: 0 for i in range(len(GRAYSCALE_FAMILY))}

    def make_counting(i, fn):
        def wrapped(img, rng):
            counts[i] += 1
            return fn(img, rng)

        return wrapped

    wrapped_family = [(make_counting(i, fn), p) for i, (fn, p) in enumerate(GRAYSCALE_FAMILY)]
    monkeypatch.setattr(augment, "GRAYSCALE_FAMILY", wrapped_family)

    n = 1500
    rng = np.random.default_rng(7)
    img = np.full((8, 8, 1), 100, np.uint8)
    for _ in range(n):
        augment_image(img, rng, color=False)
    for i, (_, p) in enumerate(GRAYSCALE_FAMILY):
        rate = counts[i] / n
        tol = 4.0 * np.sqrt(p * (1 - p) / n)
        assert abs(rate - p) < tol, f"stage {i}: empirical rate {rate:.3f} vs p={p} (tol {tol:.3f})"


def test_frequency_noise_alpha_blends_smoothly():
    """FrequencyNoiseAlpha on a constant image: both branches (Multiply /
    ContrastNormalization) are global maps, so ALL spatial structure in the
    output comes from the alpha mask — it must exist (non-constant output
    for most draws), stay inside the two branch endpoints, and be smooth
    (power-law spectrum with exponent<=0), unlike pixel noise."""
    rng = np.random.default_rng(3)
    img = np.full((32, 32, 3), 120, np.uint8)
    spatially_varying = 0
    for _ in range(30):
        out = _frequency_noise_alpha(img, rng).astype(np.float32)
        # endpooints for constant input 120: multiply in [90,150], linear
        # contrast in [~109.6, ~130.4]; blend stays within the union hull
        assert out.min() >= 80 and out.max() <= 160
        if out[..., 0].std() > 0.5:
            spatially_varying += 1
            # smoothness: neighbouring-pixel diffs must be far smaller than
            # the full spatial span (white noise would have diff ~ span)
            span = out[..., 0].max() - out[..., 0].min()
            mean_diff = np.abs(np.diff(out[..., 0], axis=0)).mean()
            assert mean_diff < 0.35 * span, "alpha mask is not smooth — not a frequency-noise blend"
    assert spatially_varying >= 10, "alpha mask almost never varies — FrequencyNoiseAlpha inert"


def test_color_brightness_includes_frequency_noise_member(monkeypatch):
    """The color brightness OneOf must select 4 members at 1/4 each —
    including the FrequencyNoiseAlpha branch (reference seq lines 68-84)."""
    hits = {"fna": 0, "total": 0}
    real = augment._frequency_noise_alpha

    def counting(img, rng):
        hits["fna"] += 1
        return real(img, rng)

    monkeypatch.setattr(augment, "_frequency_noise_alpha", counting)
    rng = np.random.default_rng(11)
    img = np.full((8, 8, 3), 100, np.uint8)
    n = 1200
    for _ in range(n):
        augment._brightness_oneof(img, rng)
        hits["total"] += 1
    rate = hits["fna"] / n
    tol = 4.0 * np.sqrt(0.25 * 0.75 / n)
    assert abs(rate - 0.25) < tol, f"FrequencyNoiseAlpha rate {rate:.3f} != 0.25"


def test_color_pipeline_shapes_and_dtype():
    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
    for _ in range(25):
        out = augment_image(img, rng, color=True)
        assert out.shape == img.shape and out.dtype == np.uint8


@pytest.mark.parametrize("color", [True, False])
def test_augment_batch(color):
    from casapose_tpu.data.augment import augment_batch

    rng = np.random.default_rng(2)
    # grayscale datasets decode to HxWx1 (data/pipeline.py::_decode_image);
    # cv2 blurs drop the singleton channel unless the ops restore it
    c = 3 if color else 1
    imgs = (rng.uniform(0, 255, (4, 16, 16, c))).astype(np.uint8)
    for _ in range(10):
        out = augment_batch(imgs, rng, color=color)
        assert out.shape == imgs.shape and out.dtype == np.uint8
