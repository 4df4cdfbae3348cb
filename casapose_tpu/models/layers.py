"""CASAPose's scientific-core layers, reformulated for TPU.

Flax equivalents of casapose/pose_models/models/_normalization_layers.py,
redesigned around the MXU/VPU instead of gathers:

  * ClassAdaptiveWeightedNorm (CLADE): parameter-free BN + per-pixel gamma/
    beta via a one-hot [P, C] @ [C, ch] matmul  (ref :85-164).
  * PartialConv: class-aware 3x3 partial convolution. Instead of
    ``tf.image.extract_patches`` + einsum (ref :302-377), the input is
    pad-shifted 9 times, each shift masked by "neighbor class == center
    class", and the whole stencil is contracted in ONE [P, 9*ch] @ [9*ch, d]
    MXU matmul — identical math, no patch materialization in HBM.
  * GuidedUpsampling / GuidedBilinearUpsampling: 2x upsamplers that copy /
    interpolate only class-matching low-res neighbors. The reference gathers
    per-pixel coordinates (ref :475-664, gather_nd); here each of the 4
    output phases selects among 4 pad-shifted candidates with pure
    elementwise selects — no gathers, fully fusable.
  * HalfSize: stride-2 identity downsample (ref :258-299) == ``x[:, ::2, ::2]``
    (optionally a trainable eye-initialized 1x1 conv, as in casapose_c).

BatchNorm note: the reference uses SyncBatchNormalization everywhere.
Under jit + GSPMD with the batch sharded over a ``data`` mesh axis, plain
``nn.BatchNorm`` batch-statistics reductions are *global* — cross-replica
sync falls out of the sharding instead of a bespoke collective (SURVEY §5.8).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 2e-5
BN_MOMENTUM = 0.99

_OFFSETS_3X3 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def batch_norm(name, center=True, scale=True, dtype=None):
    """BatchNorm with the reference's hyperparameters (eps 2e-5, mom 0.99).

    ``dtype`` is the computation dtype (bf16 for the mixed-precision
    policy); parameters and running statistics stay float32.
    """
    return nn.BatchNorm(
        name=name,
        use_running_average=None,  # controlled by `use_running_average` call arg
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        use_bias=center,
        use_scale=scale,
        dtype=dtype,
    )


def hard_onehot(logits, stop_grad=True):
    """one_hot(argmax(logits)) — the reference's ``softmax(x * 1e6)`` trick.

    The reference always wraps the result in stop_gradient (or feeds it into
    stop-gradiented consumers), so the exact hard one-hot is numerically
    identical and much cheaper than a giant-beta softmax.
    """
    import jax

    c = logits.shape[-1]
    out = (jnp.argmax(logits, axis=-1)[..., None] == jnp.arange(c)[None]).astype(logits.dtype)
    return jax.lax.stop_gradient(out) if stop_grad else out


def _shift2d(x, dy, dx, fill=0):
    """Shifted view: out[y, x] = in[y + dy, x + dx], `fill` outside."""
    if dy == 0 and dx == 0:
        return x
    h, w = x.shape[1], x.shape[2]
    pad = [(0, 0), (max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [(0, 0)] * (x.ndim - 3)
    padded = jnp.pad(x, pad, constant_values=fill)
    y0, x0 = max(dy, 0), max(dx, 0)
    return padded[:, y0 : y0 + h, x0 : x0 + w]


class ClassAdaptiveWeightedNorm(nn.Module):
    """CLADE: parameter-free BN, then per-class gamma/beta selected per pixel."""

    num_classes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, seg_onehot, use_running_average: bool):
        ch = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (self.num_classes, ch))
        beta = self.param("beta", nn.initializers.zeros, (self.num_classes, ch))
        gamma1 = seg_onehot.astype(x.dtype) @ gamma.astype(x.dtype)  # [b,h,w,ch]
        beta1 = seg_onehot.astype(x.dtype) @ beta.astype(x.dtype)
        x = batch_norm("bn", center=False, scale=False, dtype=self.dtype)(
            x, use_running_average=use_running_average
        )
        return gamma1 * x + beta1


class ClassAdaptiveNorm(nn.Module):
    """Hard-label CLADE variant (integer label map selects gamma/beta rows)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, seg_labels, use_running_average: bool):
        ch = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (self.num_classes, ch))
        beta = self.param("beta", nn.initializers.zeros, (self.num_classes, ch))
        gamma1 = jnp.take(gamma.astype(x.dtype), seg_labels, axis=0)
        beta1 = jnp.take(beta.astype(x.dtype), seg_labels, axis=0)
        x = batch_norm("bn", center=False, scale=False)(x, use_running_average=use_running_average)
        return gamma1 * x + beta1


class ClassAdaptiveWeightedNormWithInput(nn.Module):
    """CLADE with externally-provided per-class gamma/beta ([b, C, ch])."""

    num_classes: int
    learned_blend: bool = False  # ...WithInputAndLearnedParameters variant

    @nn.compact
    def __call__(self, x, seg_onehot, gamma_in, beta_in, use_running_average: bool):
        ch = x.shape[-1]
        gamma1 = jnp.einsum("bhwc,bcf->bhwf", seg_onehot, gamma_in.astype(x.dtype))
        beta1 = jnp.einsum("bhwc,bcf->bhwf", seg_onehot, beta_in.astype(x.dtype))
        if self.learned_blend:
            gamma = self.param("gamma", nn.initializers.ones, (self.num_classes, ch))
            beta = self.param("beta", nn.initializers.zeros, (self.num_classes, ch))
            alpha_1 = jnp.clip(self.param("alpha_1", nn.initializers.constant(0.5), (1,)), 0.0, 1.0)
            alpha_2 = jnp.clip(self.param("alpha_2", nn.initializers.constant(0.5), (1,)), 0.0, 1.0)
            gamma2 = seg_onehot @ gamma.astype(x.dtype)
            beta2 = seg_onehot @ beta.astype(x.dtype)
            gamma1 = alpha_1 * gamma1 + (1.0 - alpha_1) * gamma2
            beta1 = alpha_2 * beta1 + (1.0 - alpha_2) * beta2
        x = batch_norm("bn", center=False, scale=False)(x, use_running_average=use_running_average)
        return gamma1 * x + beta1


class PartialConv(nn.Module):
    """Class-aware partial 3x3 convolution (shift + masked stencil matmul).

    Called with ``seg_onehot=None`` it degrades to a plain SAME 3x3 conv with
    the same weights — this is how the reference shares conv weights between
    the two decoders (PartialConvolution.calc, _normalization_layers.py:
    326-331).
    """

    features: int
    num_classes: int

    @nn.compact
    def __call__(self, x, seg_onehot: Optional[jnp.ndarray] = None):
        ch = x.shape[-1]
        # HWIO kernel (3, 3, ch, features); he_uniform as in the reference.
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_in", "uniform"), (3, 3, ch, self.features)
        ).astype(x.dtype)

        if seg_onehot is None:
            import jax.lax as lax

            return lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        import os

        labels = jnp.argmax(seg_onehot, axis=-1)[..., None]  # [b,h,w,1]
        if os.environ.get("CASAPOSE_PARTIAL_CONV", "accumulate") == "stacked":
            shifted_feats = []
            count = None
            for (dy, dx) in _OFFSETS_3X3:
                lab_s = _shift2d(labels, dy, dx, fill=-1)
                m = (lab_s == labels).astype(x.dtype)  # [b,h,w,1]
                x_s = _shift2d(x, dy, dx) * m
                shifted_feats.append(x_s)
                count = m if count is None else count + m
            stacked = jnp.concatenate(shifted_feats, axis=-1)  # [b,h,w,9*ch]
            # Kernel taps laid out to match the offset enumeration order.
            w = kernel.reshape(9 * ch, self.features)
            out = stacked @ w  # one MXU matmul over the whole stencil
            return out * (9.0 / jnp.maximum(count, 1.0))

        # Accumulate form: 9 masked [P, ch] @ [ch, d] matmuls summed — no
        # [b, h, w, 9*ch] stencil buffer in HBM (the largest intermediate of
        # the stacked form at full resolution).
        out = None
        count = None
        for idx, (dy, dx) in enumerate(_OFFSETS_3X3):
            lab_s = _shift2d(labels, dy, dx, fill=-1)
            m = (lab_s == labels).astype(x.dtype)
            x_s = _shift2d(x, dy, dx) * m
            contrib = x_s @ kernel[dy + 1, dx + 1]
            out = contrib if out is None else out + contrib
            count = m if count is None else count + m
        return out * (9.0 / jnp.maximum(count, 1.0))


def _split_phases(hi):
    """[b, 2h, 2w, c] -> 4 phase maps [b, h, w, c] for (di, dj) in 2x2."""
    return [hi[:, di::2, dj::2] for di in (0, 1) for dj in (0, 1)]


def _merge_phases(phases, b, h2, w2, c):
    """Inverse of :func:`_split_phases`."""
    stacked = jnp.stack(phases, axis=3).reshape(b, h2, w2, 2, 2, c)
    return stacked.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _labels_from_onehot(seg):
    """argmax label map (the reference's sum(where(max) * r_up) - 1)."""
    return jnp.argmax(seg, axis=-1)


def guided_upsampling(x, seg_lo, seg_hi):
    """2x upsample copying the class-matching low-res neighbor per pixel.

    Args:
      x:      [b, h2, w2, c] features.
      seg_lo: [b, h2, w2, C] low-res (one-hot) segmentation.
      seg_hi: [b, 2*h2, 2*w2, C] high-res segmentation guide.
    For each high-res pixel the 4 candidates are the low-res pixels
    (i+a, j+b), a,b in {0,1}; the first (row-major) candidate whose label
    matches the high-res label wins; no match falls back to nearest (0, 0).
    """
    b, h2, w2, c = x.shape
    lab_lo = _labels_from_onehot(seg_lo)[..., None]  # [b,h2,w2,1]
    lab_hi = _labels_from_onehot(seg_hi)[..., None]
    lab_hi_phases = _split_phases(lab_hi)  # 4 x [b,h2,w2,1]

    cand_x = []
    cand_lab = []
    for (a, bb) in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        cand_x.append(_shift2d(x, a, bb))
        cand_lab.append(_shift2d(lab_lo, a, bb, fill=-1))

    out_phases = []
    for lab_u in lab_hi_phases:
        matches = [cl == lab_u for cl in cand_lab]
        # Priority select: first match wins; fallback = nearest (cand 0).
        sel = cand_x[0]
        for m, cx in zip(reversed(matches), reversed(cand_x)):
            sel = jnp.where(m, cx, sel)
        out_phases.append(sel)
    return _merge_phases(out_phases, b, h2, w2, c)


def guided_bilinear_upsampling(x, seg_lo, seg_hi):
    """2x bilinear upsample restricted to class-matching neighbors.

    Mismatched candidates are replaced by the mean of the matching ones
    before applying the bilinear weights [[1,0,0,0],[.5,.5,0,0],
    [.5,0,.5,0],[.25,.25,.25,.25]] per output phase (ref :596-663).
    """
    b, h2, w2, c = x.shape
    dtype = x.dtype
    lab_lo = _labels_from_onehot(seg_lo)[..., None]
    lab_hi = _labels_from_onehot(seg_hi)[..., None]
    lab_hi_phases = _split_phases(lab_hi)

    cand_x = []
    cand_lab = []
    for (a, bb) in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        cand_x.append(_shift2d(x, a, bb))
        cand_lab.append(_shift2d(lab_lo, a, bb, fill=-1))

    interp = jnp.array(
        [[1.0, 0.0, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0], [0.5, 0.0, 0.5, 0.0], [0.25, 0.25, 0.25, 0.25]], dtype
    )

    out_phases = []
    for q, lab_u in enumerate(lab_hi_phases):
        matches = [(cl == lab_u).astype(dtype) for cl in cand_lab]
        norm = sum(matches)
        masked = [cx * m for cx, m in zip(cand_x, matches)]
        total = sum(masked)
        safe_norm = jnp.maximum(norm, 1.0)
        mean_match = jnp.where(norm > 0, total / safe_norm, 0.0)
        vals = [jnp.where(m > 0, cx, mean_match) for cx, m in zip(cand_x, matches)]
        out = sum(v * interp[q, i] for i, v in enumerate(vals))
        out_phases.append(out)
    return _merge_phases(out_phases, b, h2, w2, c)


class HalfSize(nn.Module):
    """Stride-2 identity downsample; trainable variant = eye-init 1x1 conv."""

    depth: int
    trainable: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.trainable:
            return x[:, ::2, ::2, :]

        def eye_init(key, shape, dtype=jnp.float32):
            return jnp.eye(self.depth, dtype=dtype).reshape(shape)

        kernel = self.param("kernel", eye_init, (1, 1, self.depth, self.depth)).astype(x.dtype)
        return x[:, ::2, ::2, :] @ kernel[0, 0]
