"""CASAPose twin-decoder models (all zoo variants) as one Flax module.

Re-architecture of casapose/pose_models/models/{casapose.py, pose_models.py}:
the reference hand-unrolls 10 nearly-identical Keras graphs; here a single
``CASAPoseModel`` is parameterized by a :class:`VariantSpec` that encodes the
per-layer differences (CLADE, partial conv, guided / bilinear upsampling,
cross-decoder weight sharing, skip connections), with the variant table in
``registry.py`` mapping the reference model names onto specs.

Forward structure (casa_layer, ref casapose.py:42-142; wiring
pose_models.py:513-635 for the flagship casapose_c_gcu5):

  backbone -> decoder1 (conv+BN+leaky, bilinear 2x ups, skip concats)
           -> 1x1 conv seg logits
  hard one-hot mask (softmax(x*1e6) trick, stop-gradient)
  mask pyramid via stride-2 HalfSize
  decoder2 (partial conv + CLADE + guided upsampling, same skips)
           -> 1x1 conv vertex(+confidence)
  output = concat([seg logits, vertex])
"""

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from casapose_tpu.models.layers import (
    ClassAdaptiveWeightedNorm,
    HalfSize,
    PartialConv,
    batch_norm,
    guided_bilinear_upsampling,
    guided_upsampling,
    hard_onehot,
)
from casapose_tpu.models.resnet import ResNetBackbone

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


@dataclasses.dataclass(frozen=True)
class DecoderParams:
    """Per-layer decoder-2 configuration (mirrors the reference namedtuple)."""

    weighted_clade: bool = True
    partial_conv: bool = False
    guided_upsampling: bool = False
    bilinear_upsampling: bool = False
    reuse_conv: bool = False


@dataclasses.dataclass(frozen=True)
class VariantSpec:
    """Whole-model configuration distinguishing the zoo variants."""

    decoder_params: Tuple[DecoderParams, ...]
    stop_gradient_mask: bool = True  # False only for casapose_c (C1)
    halfsize_trainable: bool = False  # True only for casapose_c (C1)
    decoder2_skip_connections: bool = True  # False for casapose_c_gcu5_sw1 (C8)
    shared_reuse_with_mask: bool = True  # hand-unrolled C6 semantics; False = generic-builder
    # C10 re-applies the shared layer-1 conv WITH the mask in decoder 2
    # (pose_models.py:1292: c1([x32s, x_mask8s])); every other shared
    # variant reuses the unmasked decoder-1 output.
    reuse_first_with_mask: bool = False
    pvnet: bool = False  # single fused decoder


class CASAPoseModel(nn.Module):
    """Twin-decoder CASAPose network.

    Inputs: img [b, h, w, 3]; optional gt_seg [b, h, w, seg_dim] one-hot
    (``train_vectors_with_ground_truth`` mode: the GT mask replaces the
    predicted mask for CLADE / voting conditioning).
    Output: [b, h, w, seg_dim + ver_dim] = [seg logits | vertex (+conf)].
    """

    spec: VariantSpec
    ver_dim: int
    seg_dim: int
    base_model: str = "resnet18"
    fcdim: int = 256
    s8dim: int = 128
    s4dim: int = 64
    s2dim: int = 32
    raw_dim: int = 32
    output_labelmap: bool = False
    dtype: Optional[jnp.dtype] = None  # computation dtype; params stay f32

    @nn.compact
    def __call__(self, img, gt_seg=None, train: bool = False):
        spec = self.spec
        ura = not train
        if self.dtype is not None:
            img = img.astype(self.dtype)
        feats = ResNetBackbone(self.base_model, dtype=self.dtype, name="backbone")(img, train=train)
        x2s, x4s, x8s, _, x32s = feats
        backbone_features = [x32s, x8s, x4s, x2s, img]
        layer_dims = [self.fcdim, self.s8dim, self.s4dim, self.s2dim, self.raw_dim]

        shared_convs = [None] * 5
        for i, dp in enumerate(spec.decoder_params):
            if dp.reuse_conv:
                shared_convs[i] = PartialConv(
                    layer_dims[i], self.seg_dim, name=f"pv_block_{i + 1}_{i + 6}_conv2d"
                )

        # ------------------------------------------------------ decoder 1
        x = None
        shared_out_0 = None
        for i, dp in enumerate(spec.decoder_params):
            n = str(i + 1)
            inp = backbone_features[i] if i == 0 else jnp.concatenate([x, backbone_features[i]], axis=3)
            if dp.reuse_conv:
                h = shared_convs[i](inp)  # plain SAME conv path
                if i == 0:
                    shared_out_0 = h
            else:
                h = nn.Conv(
                    layer_dims[i],
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=_CONV_INIT,
                    name=f"pv_block_{n}_conv2d",
                    dtype=self.dtype,
                )(inp)
            h = batch_norm(f"pv_block_{n}_bn", dtype=self.dtype)(h, use_running_average=ura)
            h = nn.leaky_relu(h, negative_slope=0.1) if i > 0 else nn.relu(h)
            if 0 < i < 4:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="bilinear")
            x = h

        seg_logits = nn.Conv(
            self.seg_dim, (1, 1), use_bias=False, kernel_init=_CONV_INIT, name="pv_final_conv_segmentation",
            dtype=self.dtype,
        )(x).astype(jnp.float32)

        # Hard one-hot mask (softmax(x*1e6) + stop_gradient in the ref).
        mask_src = gt_seg if gt_seg is not None else seg_logits
        x_mask = hard_onehot(mask_src, stop_grad=spec.stop_gradient_mask)

        if spec.pvnet:
            vertex = nn.Conv(
                self.ver_dim, (1, 1), use_bias=False, kernel_init=_CONV_INIT, name="pv_final_conv_vertex"
            )(x)
            return self._assemble(seg_logits, vertex, x_mask)

        m2 = HalfSize(self.seg_dim, spec.halfsize_trainable, name="segmentation_half_size")(x_mask)
        m4 = HalfSize(self.seg_dim, spec.halfsize_trainable, name="segmentation_quater_size")(m2)
        m8 = HalfSize(self.seg_dim, spec.halfsize_trainable, name="segmentation_eighth_size")(m4)
        seg_masks = [m8, m8, m4, m2, x_mask, None]

        # ------------------------------------------------------ decoder 2
        y = None
        for i, dp in enumerate(spec.decoder_params):
            n = str(i + 6)
            mask = seg_masks[i] if dp.weighted_clade else None
            guide = seg_masks[i + 1] if dp.guided_upsampling else None

            if i == 0:
                inp = backbone_features[i]
            elif spec.decoder2_skip_connections:
                inp = jnp.concatenate([y, backbone_features[i]], axis=3)
            else:
                inp = y

            if dp.reuse_conv:
                if i == 0:
                    if spec.reuse_first_with_mask:
                        h = shared_convs[0](inp, seg_masks[0])
                    else:
                        h = shared_out_0  # reference reuses the unmasked output
                elif spec.shared_reuse_with_mask:
                    h = shared_convs[i](inp, seg_masks[i])
                else:
                    h = shared_convs[i](inp)
            elif dp.partial_conv:
                h = PartialConv(layer_dims[i], self.seg_dim, name=f"pv_block_{n}_conv2d")(inp, seg_masks[i])
            else:
                h = nn.Conv(
                    layer_dims[i],
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=_CONV_INIT,
                    name=f"pv_block_{n}_conv2d",
                    dtype=self.dtype,
                )(inp)

            if mask is not None:
                h = ClassAdaptiveWeightedNorm(self.seg_dim, dtype=self.dtype, name=f"pv_block_{n}_clade")(
                    h, mask, use_running_average=ura
                )
            else:
                h = batch_norm(f"pv_block_{n}_bn", dtype=self.dtype)(h, use_running_average=ura)

            h = nn.leaky_relu(h, negative_slope=0.1) if i > 0 else nn.relu(h)

            if 0 < i < 4:
                if dp.weighted_clade:
                    if guide is not None:
                        if dp.bilinear_upsampling:
                            h = guided_bilinear_upsampling(h, seg_masks[i], guide)
                        else:
                            h = guided_upsampling(h, seg_masks[i], guide)
                    elif dp.bilinear_upsampling:
                        # bilinear without a guide mask (ref casa_layer
                        # casapose.py:122-129)
                        b, hh, ww, cc = h.shape
                        h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="bilinear")
                    else:
                        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)  # nearest 2x
                else:
                    b, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="bilinear")
            y = h

        vertex = nn.Conv(
            self.ver_dim, (1, 1), use_bias=False, kernel_init=_CONV_INIT, name="pv_final_conv_vertex",
            dtype=self.dtype,
        )(y).astype(jnp.float32)
        return self._assemble(seg_logits, vertex, x_mask)

    def _assemble(self, seg_logits, vertex, x_mask):
        if self.output_labelmap:
            labelmap = jnp.sum(x_mask * jnp.arange(self.seg_dim, dtype=x_mask.dtype), axis=-1, keepdims=True)
            return jnp.concatenate([labelmap, vertex], axis=3)
        return jnp.concatenate([seg_logits, vertex], axis=3)


class PVNetModel(nn.Module):
    """PVNet baseline: single decoder, fused seg+vertex 1x1 output conv
    (pose_models.py:645-695)."""

    ver_dim: int
    seg_dim: int
    base_model: str = "resnet18"
    fcdim: int = 256
    s8dim: int = 128
    s4dim: int = 64
    s2dim: int = 32
    raw_dim: int = 32
    output_labelmap: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img, gt_seg=None, train: bool = False):
        ura = not train
        if self.dtype is not None:
            img = img.astype(self.dtype)
        feats = ResNetBackbone(self.base_model, dtype=self.dtype, name="backbone")(img, train=train)
        x2s, x4s, x8s, _, x32s = feats
        backbone_features = [x32s, x8s, x4s, x2s, img]
        layer_dims = [self.fcdim, self.s8dim, self.s4dim, self.s2dim, self.raw_dim]
        x = None
        for i in range(5):
            n = str(i + 1)
            inp = backbone_features[i] if i == 0 else jnp.concatenate([x, backbone_features[i]], axis=3)
            h = nn.Conv(
                layer_dims[i],
                (3, 3),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                kernel_init=_CONV_INIT,
                name=f"pv_block_{n}_conv2d",
                dtype=self.dtype,
            )(inp)
            h = batch_norm(f"pv_block_{n}_bn", dtype=self.dtype)(h, use_running_average=ura)
            h = nn.leaky_relu(h, negative_slope=0.1) if i > 0 else nn.relu(h)
            if 0 < i < 4:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="bilinear")
            x = h
        out = nn.Conv(
            self.seg_dim + self.ver_dim, (1, 1), use_bias=False, kernel_init=_CONV_INIT, name="pv_final_conv",
            dtype=self.dtype,
        )(x).astype(jnp.float32)
        if self.output_labelmap:
            seg = out[..., : self.seg_dim]
            ver = out[..., self.seg_dim :]
            labelmap = jnp.sum(
                hard_onehot(seg) * jnp.arange(self.seg_dim, dtype=out.dtype), axis=-1, keepdims=True
            )
            return jnp.concatenate([labelmap, ver], axis=3)
        return out
