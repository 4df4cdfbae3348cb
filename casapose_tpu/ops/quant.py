"""Opt-in int8 dynamic-quantized inference.

The inference pipeline is bandwidth-bound at bf16 (DESIGN.md §7): every
conv reads and writes activations at 2 bytes/element, and the v5e MXU runs
int8 at twice its bf16 MAC rate. Symmetric (zero-point-free) int8
quantization halves the dominant activation byte traffic and doubles the
compute ceiling:

  * weights: per-output-channel scales, computed from the f32 params at
    trace time (folds into constants under jit);
  * activations: one dynamic scale per image per conv (an absmax reduce
    XLA fuses into the producer's epilogue), so no calibration pass or
    stored statistics are needed. Per-image (not per-batch) scaling keeps
    each image's computation independent of its batch neighbors, so
    batched inference is bit-identical to batch-1 — the same invariant
    ``--batchsize_test`` pins for the f32 path;
  * accumulation: int32 on the MXU (``preferred_element_type``), then one
    f32 rescale + the regular BN/activation epilogue.

Symmetric quant maps 0 -> 0 exactly, so conv zero padding and masked
regions stay exact. Everything outside the convolutions (BN, CLADE,
upsampling, voting, PnP) keeps its normal dtype/numerics — this targets
exactly where the bytes and MACs are.

The reference has no quantized path (TF2/Keras f32 end to end); this is a
TPU-first extension, NOT part of reference parity. Accuracy vs the f32
forward is pinned by tests/test_quant.py on oracle-scale weights.

Usage::

    out = quantized_apply(model, variables, img)   # inference only

or wrap any model-calling function::

    with quantized_convs():
        out = model.apply(variables, img, train=False)
"""

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pair(v):
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _lax_padding(padding, kernel_size):
    """nn.Conv padding attribute -> lax.conv padding argument."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * len(_pair(kernel_size))
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def quantize_conv_int8(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Run a bound ``nn.Conv``'s convolution as s8 x s8 -> s32.

    Reads the module's own kernel/bias from its scope and mirrors its
    geometry (strides / padding / dilations / groups); only the arithmetic
    changes. NHWC inputs only (every conv in this codebase is NHWC).
    """
    kernel = jnp.asarray(mod.scope.get_variable("params", "kernel"), jnp.float32)
    # Per-output-channel symmetric scales over (H, W, I).
    w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1))), 1e-12) / 127.0
    wq = jnp.round(kernel / w_scale).astype(jnp.int8)

    x32 = x.astype(jnp.float32)
    # Per-image scale: quantizing image b must not depend on its batch
    # neighbors (batched == batch-1, bit-exact).
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=tuple(range(1, x32.ndim)), keepdims=True), 1e-12
    ) / 127.0
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=_pair(mod.strides),
        padding=_lax_padding(mod.padding, mod.kernel_size),
        lhs_dilation=_pair(mod.input_dilation) if mod.input_dilation is not None else None,
        rhs_dilation=_pair(mod.kernel_dilation) if mod.kernel_dilation is not None else None,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * w_scale)  # w_scale broadcasts over the channel dim
    if mod.use_bias:
        out = out + jnp.asarray(mod.scope.get_variable("params", "bias"), jnp.float32)
    return out.astype(x.dtype)


def quantize_partial_conv_int8(mod, x: jnp.ndarray, seg_onehot=None) -> jnp.ndarray:
    """Int8 version of ``models.layers.PartialConv``.

    The class-masked stencil stays exact under symmetric quantization: the
    0/1 neighbor mask multiplies int8 values (jnp.where), shifts pad with
    the exact 0 code, and all 9 taps share the per-output-channel weight
    scale so their int32 accumulators sum coherently. The 9/count
    normalization applies after the one f32 rescale, as in the f32 layer.
    """
    from casapose_tpu.models.layers import _OFFSETS_3X3, _shift2d

    kernel = jnp.asarray(mod.scope.get_variable("params", "kernel"), jnp.float32)  # (3, 3, ch, f)
    w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.round(kernel / w_scale).astype(jnp.int8)

    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(x32), axis=tuple(range(1, x32.ndim)), keepdims=True), 1e-12
    ) / 127.0  # per image, see quantize_conv_int8
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)

    if seg_onehot is None:
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(x.dtype)

    labels = jnp.argmax(seg_onehot, axis=-1)[..., None]  # [b, h, w, 1]
    acc = None
    count = None
    for (dy, dx) in _OFFSETS_3X3:
        lab_s = _shift2d(labels, dy, dx, fill=-1)
        m = lab_s == labels
        x_s = jnp.where(m, _shift2d(xq, dy, dx), jnp.int8(0))
        contrib = jax.lax.dot_general(
            x_s, wq[dy + 1, dx + 1], (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = contrib if acc is None else acc + contrib
        c = m.astype(jnp.float32)
        count = c if count is None else count + c
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    return (out * (9.0 / jnp.maximum(count, 1.0))).astype(x.dtype)


def _interceptor(next_fun, args, kwargs, context):
    from casapose_tpu.models.layers import PartialConv

    mod = context.module
    if isinstance(mod, nn.Conv) and context.method_name == "__call__":
        return quantize_conv_int8(mod, args[0])
    if isinstance(mod, PartialConv) and context.method_name == "__call__":
        seg = args[1] if len(args) > 1 else kwargs.get("seg_onehot")
        return quantize_partial_conv_int8(mod, args[0], seg)
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def quantized_convs():
    """Context manager: every ``nn.Conv`` apply inside runs int8-quantized."""
    with nn.intercept_methods(_interceptor):
        yield


def quantized_apply(model, variables, *args, **kwargs):
    """``model.apply`` with all ``nn.Conv`` layers int8-quantized.

    Inference only (``train=False`` is forced): quantization noise has no
    straight-through estimator here, so the path is not for training.
    """
    kwargs["train"] = False
    with quantized_convs():
        return model.apply(variables, *args, **kwargs)
