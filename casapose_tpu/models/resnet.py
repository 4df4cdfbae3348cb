"""Pre-activation ResNet backbone with output-stride-8 dilation.

Flax rebuild of the reference's qubvel classification_models port
(casapose/pose_models/models/resnet.py): conv0 7x7/2 stem, pre-activation
basic/bottleneck blocks, and the dilation trick — once the cumulative
stride reaches 8, later stages keep stride 1 with doubled dilation
(resnet.py:220-221,273-281) — so all deep features stay at 1/8 resolution.

Returns the same 5 feature maps the decoders consume:
[x2s (relu0, s2), x4s (stage2 pre-act, s4), x8s (stage3 pre-act, s8),
 x16s (stage4 pre-act, s8), x32s (final bn+relu, s8)].

BatchNorm layers become cross-replica automatically under GSPMD data
parallelism (global-batch reductions); see models/layers.py.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from casapose_tpu.models.layers import batch_norm

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")  # he_uniform

RESNET_PARAMS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}


def _conv(features, kernel, strides, dilation, name, padding, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        kernel_dilation=(dilation, dilation),
        padding=padding,
        use_bias=False,
        kernel_init=_CONV_INIT,
        name=name,
        dtype=dtype,
    )


class ResNetBackbone(nn.Module):
    """Pre-activation ResNet; `model_name` selects depth/block type."""

    model_name: str = "resnet18"
    dtype: Any = None  # computation dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        repetitions, bottleneck = RESNET_PARAMS[self.model_name]
        ura = not train  # use_running_average
        init_filters = 64
        output = []
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = batch_norm("bn_data", scale=False, dtype=self.dtype)(x, use_running_average=ura)
        x = _conv(init_filters, 7, 2, 1, "conv0", [(3, 3), (3, 3)], self.dtype)(x)
        x = batch_norm("bn0", dtype=self.dtype)(x, use_running_average=ura)
        x2 = nn.relu(x)
        output.append(x2)  # x2s
        x = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        output_stride = 8
        current_stride = 4
        dilation = 1
        for stage, rep in enumerate(repetitions):
            for block in range(rep):
                filters = init_filters * (2**stage)
                if block == 0 and stage == 0:
                    x, _ = self._block(x, filters, stage, block, 1, dilation, "post", bottleneck, ura)
                elif block == 0:
                    stride = 2
                    if current_stride == output_stride:
                        dilation *= 2
                        stride = 1
                    else:
                        current_stride *= 2
                    x, x_temp = self._block(x, filters, stage, block, stride, dilation, "post", bottleneck, ura)
                    output.append(x_temp)
                else:
                    x, _ = self._block(x, filters, stage, block, 1, dilation, "pre", bottleneck, ura)

        x = batch_norm("bn1", dtype=self.dtype)(x, use_running_average=ura)
        output.append(nn.relu(x))
        return output  # [x2s, x4s, x8s, x16s, x32s]

    def _block(self, x, filters, stage, block, stride, dilation, cut, bottleneck, ura):
        base = f"stage{stage + 1}_unit{block + 1}_"
        pad = dilation  # == ((3-1)*(d-1)+3 - 1) / 2 for a 3x3 kernel

        h = batch_norm(base + "bn1", dtype=self.dtype)(x, use_running_average=ura)
        x2 = nn.relu(h)

        if cut == "pre":
            shortcut = x
        else:
            sc_features = filters * (4 if bottleneck else 1)
            shortcut = _conv(sc_features, 1, stride, 1, base + "sc", "VALID", self.dtype)(x2)

        if bottleneck:
            h = _conv(filters, 1, 1, 1, base + "conv1", "VALID", self.dtype)(x2)
            h = batch_norm(base + "bn2", dtype=self.dtype)(h, use_running_average=ura)
            h = nn.relu(h)
            h = _conv(filters, 3, stride, dilation, base + "conv2", [(pad, pad), (pad, pad)], self.dtype)(h)
            h = batch_norm(base + "bn3", dtype=self.dtype)(h, use_running_average=ura)
            h = nn.relu(h)
            h = _conv(filters * 4, 1, 1, 1, base + "conv3", "VALID", self.dtype)(h)
        else:
            h = _conv(filters, 3, stride, dilation, base + "conv1", [(pad, pad), (pad, pad)], self.dtype)(x2)
            h = batch_norm(base + "bn2", dtype=self.dtype)(h, use_running_average=ura)
            h = nn.relu(h)
            h = _conv(filters, 3, 1, dilation, base + "conv2", [(pad, pad), (pad, pad)], self.dtype)(h)

        return h + shortcut, x2
