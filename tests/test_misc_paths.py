"""Grayscale input path, second-largest-component mode, labelmap output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casapose_tpu.data.pipeline import prepare_device_batch
from casapose_tpu.models.registry import get_model
from casapose_tpu.ops.voting import instance_filter_mask


def test_grayscale_to_rgb_path():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 8, 8, 1)).astype(np.uint8)
    labels = np.zeros((1, 8, 8, 1), np.uint8)
    out, _ = prepare_device_batch(jnp.asarray(img), jnp.asarray(labels), 2, grayscale_to_rgb=True)
    assert out.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out)[..., 0], np.asarray(out)[..., 2])


@pytest.mark.slow
def test_output_labelmap_mode():
    model = get_model("casapose_c_gcu5", ver_dim=6, seg_dim=3, output_labelmap=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(lambda k, im: model.init(k, im, train=False))(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 1 + 6)  # labelmap + vertex
    labelmap = np.asarray(out[..., 0])
    assert np.all((labelmap >= 0) & (labelmap <= 2))
    assert np.allclose(labelmap, np.round(labelmap))


def test_instance_filter_second_largest():
    fg = np.zeros((1, 64, 64, 1), bool)
    fg[0, 4:20, 4:20, 0] = True  # 256 px
    fg[0, 30:60, 30:60, 0] = True  # 900 px
    out = np.asarray(instance_filter_mask(jnp.asarray(fg), min_component_size=16, second_largest=True))
    assert out[0, 10, 10, 0] == 1.0  # second-largest kept
    assert out[0, 45, 45, 0] == 0.0  # largest dropped


def test_instance_filter_full_resolution_mode():
    fg = np.zeros((1, 32, 32, 1), bool)
    fg[0, 2:6, 2:6, 0] = True  # 16 px (dropped at min 50)
    fg[0, 10:30, 10:30, 0] = True  # 400 px
    out = np.asarray(instance_filter_mask(jnp.asarray(fg), min_component_size=50, downsample=1))
    assert out.sum() == 400
