"""Model zoo: shapes, layer semantics vs. numpy oracles, variant coverage."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casapose_tpu.models.layers import (
    PartialConv,
    _shift2d,
    guided_bilinear_upsampling,
    guided_upsampling,
    hard_onehot,
)
from casapose_tpu.models.registry import MODEL_SPECS, get_model
from casapose_tpu.models.resnet import ResNetBackbone


def test_shift2d():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    out = np.asarray(_shift2d(x, 1, 0, fill=-1))[0, :, :, 0]
    ref = np.full((3, 4), -1.0)
    ref[0:2] = np.asarray(x)[0, 1:3, :, 0]
    np.testing.assert_array_equal(out, ref)
    out = np.asarray(_shift2d(x, 0, -1, fill=0))[0, :, :, 0]
    ref = np.zeros((3, 4))
    ref[:, 1:] = np.asarray(x)[0, :, 0:3, 0]
    np.testing.assert_array_equal(out, ref)


def test_hard_onehot():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 5)).astype(np.float32))
    out = np.asarray(hard_onehot(logits))
    am = np.argmax(np.asarray(logits), -1)
    assert np.array_equal(np.argmax(out, -1), am)
    assert np.all(out.sum(-1) == 1)


def _partial_conv_oracle(x, seg, kernel):
    """Direct numpy implementation of the reference's patch math."""
    b, h, w, ch = x.shape
    dim = kernel.shape[-1]
    labels = np.argmax(seg, -1)
    out = np.zeros((b, h, w, dim), np.float32)
    for bi in range(b):
        for y in range(h):
            for xx in range(w):
                acc = np.zeros(dim, np.float32)
                count = 0
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xc = y + dy, xx + dx
                        if 0 <= yy < h and 0 <= xc < w and labels[bi, yy, xc] == labels[bi, y, xx]:
                            acc += x[bi, yy, xc] @ kernel[dy + 1, dx + 1]
                            count += 1
                out[bi, y, xx] = acc * (9.0 / max(count, 1))
    return out


def test_partial_conv_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    seg = rng.normal(size=(1, 6, 7, 4)).astype(np.float32)
    layer = PartialConv(5, 4)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(seg))
    out = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(seg)))
    kernel = np.asarray(params["params"]["kernel"])
    ref = _partial_conv_oracle(x, seg, kernel)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_partial_conv_no_mask_is_plain_conv():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    layer = PartialConv(5, 4)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(layer.apply(params, jnp.asarray(x)))
    # Uniform-class mask => every neighbor matches => partial == plain conv
    # away from borders (borders differ: plain conv zero-pads features while
    # partial conv renormalizes by the valid count).
    seg = np.ones((1, 6, 7, 1), np.float32)
    out_masked = np.asarray(layer.apply(params, jnp.asarray(x), jnp.asarray(seg)))
    np.testing.assert_allclose(out[:, 1:-1, 1:-1], out_masked[:, 1:-1, 1:-1], rtol=1e-4, atol=1e-4)


def _guided_up_oracle(x, seg_lo, seg_hi):
    b, h2, w2, c = x.shape
    lab_lo = np.argmax(seg_lo, -1)
    lab_hi = np.argmax(seg_hi, -1)
    out = np.zeros((b, 2 * h2, 2 * w2, c), np.float32)
    for bi in range(b):
        for i in range(h2):
            for j in range(w2):
                for di in (0, 1):
                    for dj in (0, 1):
                        target = lab_hi[bi, 2 * i + di, 2 * j + dj]
                        chosen = (i, j)  # nearest fallback
                        for (a, bb) in [(0, 0), (0, 1), (1, 0), (1, 1)]:
                            yy, xx = i + a, j + bb
                            if yy < h2 and xx < w2 and lab_lo[bi, yy, xx] == target:
                                chosen = (yy, xx)
                                break
                        out[bi, 2 * i + di, 2 * j + dj] = x[bi, chosen[0], chosen[1]]
    return out


def test_guided_upsampling_matches_oracle():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)
    seg_lo = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)
    seg_hi = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
    out = np.asarray(guided_upsampling(jnp.asarray(x), jnp.asarray(seg_lo), jnp.asarray(seg_hi)))
    ref = _guided_up_oracle(x, seg_lo, seg_hi)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_guided_bilinear_upsampling_uniform_mask_is_bilinear_phase0():
    # With a uniform class map, phase (0,0) copies the source pixel exactly
    # and phase (1,1) averages the 2x2 neighborhood.
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    seg_lo = np.ones((1, 4, 4, 1), np.float32)
    seg_hi = np.ones((1, 8, 8, 1), np.float32)
    out = np.asarray(guided_bilinear_upsampling(jnp.asarray(x), jnp.asarray(seg_lo), jnp.asarray(seg_hi)))
    np.testing.assert_allclose(out[0, 0::2, 0::2], x[0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 1], x[0, 0:2, 0:2].mean(axis=(0, 1)), atol=1e-6)


def test_resnet18_feature_shapes():
    model = ResNetBackbone("resnet18")
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes[0] == (1, 32, 48, 64)  # x2s
    assert shapes[1] == (1, 16, 24, 64)  # x4s
    assert shapes[2] == (1, 8, 12, 128)  # x8s (stride-8 clamp from here on)
    assert shapes[3] == (1, 8, 12, 256)  # x16s at s8
    assert shapes[4] == (1, 8, 12, 512)  # x32s at s8


@pytest.mark.parametrize("name", sorted(MODEL_SPECS) + ["pvnet"])
def test_model_variants_forward(name):
    oc, k = 2, 3
    seg_dim = 1 + oc
    ver_dim = k * 2 + k  # with confidence
    model = get_model(name, ver_dim=ver_dim, seg_dim=seg_dim)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    expected_c = seg_dim + ver_dim if name != "pvnet" else seg_dim + ver_dim
    assert out.shape == (1, 32, 32, expected_c)
    assert np.all(np.isfinite(np.asarray(out)))


def test_model_gt_seg_input():
    model = get_model("casapose_c_gcu5", ver_dim=6, seg_dim=3)
    x = jnp.zeros((1, 32, 32, 3))
    gt = jax.nn.one_hot(jnp.zeros((1, 32, 32), jnp.int32), 3)
    variables = model.init(jax.random.PRNGKey(0), x, gt, train=False)
    out = model.apply(variables, x, gt, train=False)
    assert out.shape == (1, 32, 32, 9)


def test_model_train_mode_updates_batch_stats():
    model = get_model("casapose_c_gcu5", ver_dim=6, seg_dim=3)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = flax.traverse_util.flatten_dict(variables["batch_stats"])
    after = flax.traverse_util.flatten_dict(mutated["batch_stats"])
    changed = any(not np.allclose(before[k], after[k]) for k in before)
    assert changed


def test_shared_conv_variants_share_parameters():
    model = get_model("casapose_c_gcu5_sw5", ver_dim=6, seg_dim=3)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    names = set(variables["params"].keys())
    assert "pv_block_1_6_conv2d" in names
    assert "pv_block_1_conv2d" not in names
    assert "pv_block_6_conv2d" not in names
