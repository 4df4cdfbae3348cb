"""Int8 quantized-inference path (ops/quant.py).

Two layers of evidence:
  * arithmetic exactness — inputs/weights already on the int8 grid must
    reproduce the f32 convolution to f32 roundoff (pins the scale math,
    geometry mirroring, bias, and the s8xs8->s32 contraction);
  * model-level fidelity — the full CASAPose forward under
    ``quantized_apply`` stays close to the f32 forward, and the
    segmentation decision (argmax over seg logits) survives quantization
    almost everywhere.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casapose_tpu.ops.quant import quantized_apply, quantized_convs


def _exact_grid(rng, shape, scale, saturate_axis=None):
    """Random tensor already on the symmetric int8 grid: q * scale, |q|<=127.

    Quantization is exact only when the derived scale equals ``scale``,
    i.e. the absmax is exactly 127*scale — per tensor (saturate one entry)
    or per channel of ``saturate_axis`` (saturate one entry per slice).
    """
    q = rng.integers(-127, 128, shape)
    if saturate_axis is None:
        q.flat[0] = 127
    else:
        q = np.moveaxis(q, saturate_axis, -1)
        q.reshape(-1, q.shape[-1])[0, :] = 127
        q = np.moveaxis(q, -1, saturate_axis)
    return (q * scale).astype(np.float32)


@pytest.mark.parametrize(
    "kernel_size,strides,padding,dilation",
    [
        ((3, 3), (1, 1), [(1, 1), (1, 1)], (1, 1)),
        ((1, 1), (1, 1), "SAME", (1, 1)),
        ((7, 7), (2, 2), "SAME", (1, 1)),
        ((3, 3), (1, 1), "SAME", (2, 2)),  # stride-8 backbone dilated conv
    ],
)
def test_quantized_conv_exact_on_grid(kernel_size, strides, padding, dilation):
    rng = np.random.default_rng(0)
    # saturate_axis=0: activation scales are per image, so each batch
    # element must hit the grid's absmax for quantization to be exact.
    x = _exact_grid(rng, (2, 16, 20, 8), scale=0.5, saturate_axis=0)
    conv = nn.Conv(
        12, kernel_size, strides=strides, padding=padding, kernel_dilation=dilation, use_bias=True
    )
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # Re-grid the kernel per output channel so weight quantization is exact
    # too (per-channel scales = max|w_c| / 127 reproduce these exactly).
    k = variables["params"]["kernel"]
    k_grid = _exact_grid(rng, k.shape, scale=1.0 / 508.0, saturate_axis=-1)
    variables = {"params": {"kernel": jnp.asarray(k_grid), "bias": variables["params"]["bias"]}}

    ref = conv.apply(variables, jnp.asarray(x))
    with quantized_convs():
        out = conv.apply(variables, jnp.asarray(x))
    # The int8 path is exact on the grid (int32 accumulation); the f32
    # reference conv carries f32 accumulation-order roundoff — compare at
    # roundoff level (a scale/geometry bug would show at ~1e-2).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_quantized_partial_conv_exact_on_grid(masked):
    """The class-masked stencil conv is exact on the int8 grid: the 0/1
    neighbor mask and zero-padded shifts preserve the grid, and all taps
    share the per-channel weight scale."""
    from casapose_tpu.models.layers import PartialConv

    rng = np.random.default_rng(3)
    x = _exact_grid(rng, (2, 12, 14, 8), scale=0.25, saturate_axis=0)
    num_classes = 3
    pc = PartialConv(10, num_classes)
    seg = None
    if masked:
        labels = rng.integers(0, num_classes, (2, 12, 14))
        seg = jnp.asarray(np.eye(num_classes, dtype=np.float32)[labels])
    variables = pc.init(jax.random.PRNGKey(0), jnp.asarray(x), seg)
    k_grid = _exact_grid(rng, variables["params"]["kernel"].shape, scale=1.0 / 508.0, saturate_axis=-1)
    variables = {"params": {"kernel": jnp.asarray(k_grid)}}

    ref = pc.apply(variables, jnp.asarray(x), seg)
    with quantized_convs():
        out = pc.apply(variables, jnp.asarray(x), seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_quantized_forward_fidelity():
    """Full flagship forward: int8 output stays close to f32, and the
    segmentation argmax flips only on a small fraction of pixels."""
    from casapose_tpu.models.registry import get_model

    no_objects, k = 2, 9
    model = get_model(
        "casapose_c_gcu5", ver_dim=k * 2 + k, seg_dim=1 + no_objects, base_model="resnet18"
    )
    img = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(2), img)

    ref = np.asarray(model.apply(variables, img, train=False))
    out = np.asarray(quantized_apply(model, variables, img))
    assert out.shape == ref.shape and np.all(np.isfinite(out))

    seg_dim = 1 + no_objects
    # Per-head deviation scaled by that head's dynamic range. Worst-case on
    # the vertex head is intentionally NOT asserted: the hard one-hot mask
    # gates decoder 2 (CLADE class params, guided-upsampling phase picks),
    # so a boundary-pixel argmax flip legitimately produces an O(1) local
    # change there — the tail quantiles are the quantization-noise signal.
    for name, sl, p99_tol in (("seg", slice(0, seg_dim), 0.05), ("vertex", slice(seg_dim, None), 0.05)):
        r, o = ref[..., sl], out[..., sl]
        rel = np.abs(o - r) / max(np.abs(r).max(), 1e-6)
        assert np.quantile(rel, 0.99) < p99_tol, f"{name} p99 deviation {np.quantile(rel, 0.99):.4f}"
        assert np.quantile(rel, 0.5) < 0.02, f"{name} median deviation {np.quantile(rel, 0.5):.4f}"
    rel_seg = np.abs(out[..., :seg_dim] - ref[..., :seg_dim]) / max(np.abs(ref[..., :seg_dim]).max(), 1e-6)
    assert rel_seg.max() < 0.15, f"seg worst-case deviation {rel_seg.max():.3f}"

    agree = np.mean(np.argmax(out[..., :seg_dim], -1) == np.argmax(ref[..., :seg_dim], -1))
    assert agree > 0.97, f"seg argmax agreement {agree:.4f}"


def test_quantized_batch_independence():
    """Activation scales are per image: quantizing a batch must give the
    same bits as quantizing each image alone. This is what keeps
    ``--batchsize_test`` metric-identical to batch-1 under int8 (an image
    with large activation outliers must not coarsen its neighbors'
    quantization grid)."""
    from casapose_tpu.models.registry import get_model

    no_objects, k = 2, 9
    model = get_model(
        "casapose_c_gcu5", ver_dim=k * 2 + k, seg_dim=1 + no_objects, base_model="resnet18"
    )
    rng = np.random.default_rng(7)
    # Image 0 carries a 50x outlier; image 1 is ordinary.
    batch = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    batch[0, 3, 4, :] = 50.0
    img = jnp.asarray(batch)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(2), img[:1])

    batched = np.asarray(quantized_apply(model, variables, img))
    singles = np.concatenate(
        [np.asarray(quantized_apply(model, variables, img[i : i + 1])) for i in range(2)]
    )
    np.testing.assert_array_equal(batched, singles)
