"""Differentiable weighted least-squares keypoint voting.

TPU-native rework of ``CoordLSVotingWeighted``
(casapose/pose_estimation/voting_layers_2d.py:5-122). Per (object o,
keypoint k) the voted point solves the normal equations accumulated over all
pixels p of class o:

    R[o,k] = sum_p  m[p,o] w[p,k] (I - n n^T)[p,k]          (2x2)
    q[o,k] = sum_p  m[p,o] w[p,k] (I - n n^T)[p,k] c[p]     (2,)
    point  = pinv(R) q * h

where n is the predicted unit direction, c the pixel-center coordinate
normalized by image *height* on both axes (reference quirk, kept), and w a
softplus/sigmoid confidence.

Instead of materializing the reference's [b,h,w,O,K,2,2] tensor and reducing
it in float64 (voting_layers_2d.py:107-116), the accumulation is phrased as
a single MXU matmul  S = M @ A  with M = one-hot class masks [O, P] and
A[p, (k,f)] = w * {a, b, d, qy, qx, 1}[p, k]: XLA's tree reduction keeps
float32 accumulation accurate, and normalizing by the weight mass (feature
f=5) before the tiny 2x2 pseudo-inverse keeps the solve conditioned, so no
float64 island is needed.
"""

import jax
import jax.numpy as jnp
from jax import lax

from casapose_tpu.core.numerics import divide_no_nan
from casapose_tpu.ops.connected_components import largest_component_mask


def instance_filter_mask(hot_bool, min_component_size=50, second_largest=False, downsample=4):
    """Largest-connected-component filter for per-class masks.

    Args:
      hot_bool: [b, h, w, oc] boolean per-class foreground.
    Returns: [b, h, w, oc] float32 keep-mask.

    The labeling runs at 1/``downsample`` resolution (OR-pooled), which
    makes the flood scans ~downsample^2 cheaper and compiles minutes
    faster. Component SIZES are exact at any downsample: each coarse cell
    is weighted by its true fine-pixel count, so both the
    ``min_component_size`` threshold and the largest-component choice use
    TRUE pixel counts (validated vs scipy in tests/test_cc_filter.py).
    Only connectivity is coarsened — blobs closer than ``downsample`` px
    can merge. Set ``downsample=1`` for exact tfa semantics.
    """
    b, h, w, oc = hot_bool.shape
    flat = hot_bool.transpose(0, 3, 1, 2).reshape(b * oc, h, w)
    if downsample > 1:
        hs, ws = h // downsample, w // downsample
        cropped = flat[:, : hs * downsample, : ws * downsample]
        blocks = cropped.reshape(b * oc, hs, downsample, ws, downsample)
        small = blocks.any(axis=(2, 4))
        counts = blocks.sum(axis=(2, 4))  # true pixels per coarse cell
        comp_small = largest_component_mask(
            small, min_size=min_component_size, second_largest=second_largest, weights=counts
        )
        comp = jnp.repeat(jnp.repeat(comp_small, downsample, axis=1), downsample, axis=2)
        pad_h, pad_w = h - hs * downsample, w - ws * downsample
        if pad_h or pad_w:
            comp = jnp.pad(comp, ((0, 0), (0, pad_h), (0, pad_w)))
        comp = comp * flat.astype(comp.dtype)
    else:
        comp = largest_component_mask(flat, min_size=min_component_size, second_largest=second_largest)
    return comp.reshape(b, oc, h, w).transpose(0, 2, 3, 1)


def _pinv_2x2_solve(a, b, d, qy, qx):
    """Solve [[a,b],[b,d]] p = [qy,qx] with pseudo-inverse fallback.

    Handles the rank-1 (all directions parallel) and rank-0 (empty mask)
    cases that ``tf.linalg.pinv`` covered in the reference.
    """
    det = a * d - b * b
    trace = a + d
    scale = jnp.maximum(trace, 1e-30)
    # Full-rank branch.
    ok = det > (1e-6 * scale * scale)
    safe_det = jnp.where(ok, det, 1.0)
    py_full = (d * qy - b * qx) / safe_det
    px_full = (-b * qy + a * qx) / safe_det
    # Rank-1 branch: R = lambda u u^T with lambda = trace; pinv = R/lambda^2.
    inv_tr2 = divide_no_nan(1.0, scale * scale)
    py_r1 = (a * qy + b * qx) * inv_tr2
    px_r1 = (b * qy + d * qx) * inv_tr2
    py = jnp.where(ok, py_full, py_r1)
    px = jnp.where(ok, px_full, px_r1)
    return py, px


def ls_voting(
    seg,
    directions,
    weights,
    num_points=9,
    sigmoid_weights=False,
    filter_estimates=False,
    output_second_largest_component=False,
    min_component_size=50,
    cc_downsample=4,
    raw_output=None,
):
    """Weighted least-squares keypoint voting.

    Args:
      seg:        [b, h, w, 1+oc] segmentation logits (or one-hot GT);
                  stop-gradiented and hard-argmaxed, as in the reference.
      directions: [b, h, w, num_points*2] predicted (dy, dx) fields.
      weights:    [b, h, w, num_points] raw confidences.
      sigmoid_weights: sigmoid instead of softplus confidence transform.
      filter_estimates: keep only the largest connected component >=
        ``min_component_size`` px of each class mask (inference-time filter).
      cc_downsample: resolution divisor for the component labeling
        (see instance_filter_mask; 1 = exact tfa semantics).
      raw_output: optional [b, h, w, seg_dim + 3k] raw network output
        (``[seg | dirs | conf]``). When given on an accelerator backend,
        the whole per-pixel pipeline runs as ONE fused Pallas pass
        (ops/voting_kernel.py) instead of materializing the [b,h,w,k,6]
        feature tensor — ~20% end-to-end inference speedup at 480x640.
        Semantics are identical (softplus weights; set
        CASAPOSE_VOTING=xla to force the XLA path). Inference-only: the
        fused path is stop-gradiented — training keeps the differentiable
        XLA formulation by not passing ``raw_output``.
    Returns:
      [b, oc, num_points, 2] voted keypoints in (y, x) pixels (scaled by
      image height on both axes — reference convention).
    """
    b, h, w_img, c = seg.shape
    oc = c - 1
    k = num_points
    dtype = directions.dtype

    seg = lax.stop_gradient(seg)
    labels = jnp.argmax(seg, axis=-1)  # [b,h,w]
    hot = (labels[..., None] == (jnp.arange(oc, dtype=jnp.int32) + 1)[None, None, None]).astype(dtype)

    if filter_estimates:
        hot = hot * instance_filter_mask(
            hot > 0.5, min_component_size, output_second_largest_component, downsample=cc_downsample
        ).astype(dtype)

    import os

    # The fused Pallas accumulation is correct but measured SLOWER than the
    # XLA formulation below at 480x640 (its per-row MXU dot loop is
    # latency-bound: ~190 ms/step vs ~10 ms); opt in with
    # CASAPOSE_VOTING=pallas for experimentation.
    use_kernel = (
        raw_output is not None
        and not sigmoid_weights
        and jax.default_backend() not in ("cpu",)
        and os.environ.get("CASAPOSE_VOTING", "xla") == "pallas"
        and h % 16 == 0
    )
    if use_kernel:
        from casapose_tpu.ops.voting_kernel import voting_accumulate_pallas

        # Filtered label map: a pixel keeps its label only if its class
        # mask survived the instance filter there.
        labels_f = jnp.where(jnp.sum(hot, axis=-1) > 0.5, labels, 0).astype(jnp.int32)
        S6 = voting_accumulate_pallas(
            lax.stop_gradient(raw_output.astype(jnp.float32)), labels_f, c, k
        )  # [b, oc, k, 6]
        mass = jnp.maximum(S6[..., 5], 1e-20)
        py, px = _pinv_2x2_solve(
            S6[..., 0] / mass, S6[..., 1] / mass, S6[..., 2] / mass, S6[..., 3] / mass, S6[..., 4] / mass
        )
        pts = jnp.stack([py, px], axis=-1).astype(jnp.float32)
        return pts * jnp.float32(h)

    if sigmoid_weights:
        wgt = jnp.reciprocal(1.0 + jnp.exp(-weights))
    else:
        wgt = jnp.logaddexp(weights, 0.0)  # softplus

    n = directions.reshape(b, h, w_img, k, 2)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = divide_no_nan(n, norm)
    ny, nx = n[..., 0], n[..., 1]  # [b,h,w,k]

    a = 1.0 - ny * ny
    bb = -ny * nx
    d = 1.0 - nx * nx

    cy = ((jnp.arange(h, dtype=dtype) + 0.5) / h)[None, :, None, None]
    cx = ((jnp.arange(w_img, dtype=dtype) + 0.5) / h)[None, None, :, None]
    qy = a * cy + bb * cx
    qx = bb * cy + d * cx

    ones = jnp.ones_like(a)
    # The voting reduction, phrased as MXU contractions of the hot mask
    # against per-pixel features.
    # Full f32 operands AND f32 accumulation are REQUIRED, not a choice:
    # within a class blob the predicted directions are nearly parallel
    # (they all point at the same distant keypoint), so R is near-rank-1
    # and det = a*d - b^2 is a small difference of large sums — bf16 feats
    # were measured to move voted points by up to ~32 px at 480x640 (the
    # conditioning the reference's float64 pinv protected; our f32 path
    # holds ~2e-5 px because normalizing by the weight mass keeps the
    # cancellation at f32-roundoff scale). See docs/DESIGN.md §7.
    # (Two further alternatives measured SLOWER end-to-end at 480x640
    # batch 16 and were rejected: a fused Pallas accumulation
    # (ops/voting_kernel.py, latency-bound row-dot loop, ~190 ms) and a
    # factored [3oc,P]x[P,4k] split that rides cy/cx on the mask side
    # (~64 -> 51 img/s).)
    # Default "multi": six independent [oc,P]x[P,k] contractions sharing
    # the hot mask. The single-matmul "stack" form materializes a
    # [b,h,w,k,6] f32 feats tensor (~1 GB at B16 480x640) whose jnp.stack
    # lowers to chained full-buffer dynamic-update-slices — measured
    # ~13 GB/step of pure copy traffic in the optimized HLO
    # (benchmarks/hbm_bytes.py). Splitting the contraction avoids the wide
    # buffer entirely: 65.4 -> 78.3 img/s end-to-end at 480x640 B16.
    # All forms stay inside the 1e-3 px float64-reference parity band
    # (tests/test_tf_parity.py::test_ls_voting_parity, run per-form);
    # CASAPOSE_VOTING_FORM={stack,concat,bf16c} kept for measurement
    # (bf16c: centered bf16 operands, see below — accuracy is px-scale,
    # not the 1e-3 parity band; opt-in only).
    form = os.environ.get("CASAPOSE_VOTING_FORM", "multi")
    if form == "bf16c":
        # bf16 operands with per-class coordinate centering (VERDICT r4
        # item 6b). Plain bf16 feats were measured to move voted points by
        # ~32 px: p is an ABSOLUTE position (|c| up to w/h ~ 1.33), so the
        # q sums cancel at full coordinate magnitude. Centering solves the
        # shifted system R p' = q' with c' = c - c0[class] (exactly
        # p = p' + c0, since q' = q - R c0): |c'| is the blob radius
        # (~0.05-0.2), so bf16's 8-bit mantissa rounds a quantity ~10x
        # smaller. Because ``hot`` is one-hot over classes, the per-pixel
        # center c0p = sum_o hot[..,o] * c0[o] makes the centered features
        # class-independent again — the same six mask-shared contractions
        # apply, with bf16 inputs feeding the MXU at double rate and half
        # the operand bytes, f32 accumulation (preferred_element_type).
        # The tiny centroid reductions and the 2x2 solve stay f32.
        mass0 = jnp.sum(hot, axis=(1, 2))  # [b,oc]
        inv_m0 = divide_no_nan(1.0, mass0)
        cy1 = cy[..., 0]  # [1,h,1]
        cx1 = cx[..., 0]  # [1,1,w]
        c0y = jnp.sum(hot * cy1[..., None], axis=(1, 2)) * inv_m0  # [b,oc]
        c0x = jnp.sum(hot * cx1[..., None], axis=(1, 2)) * inv_m0
        c0py = jnp.einsum("bhwo,bo->bhw", hot, c0y)  # per-pixel class center
        c0px = jnp.einsum("bhwo,bo->bhw", hot, c0x)
        cyp = (cy1 - c0py)[..., None]  # [b,h,w,1]
        cxp = (cx1 - c0px)[..., None]
        qyp = a * cyp + bb * cxp
        qxp = bb * cyp + d * cxp
        hot16 = hot.astype(jnp.bfloat16)
        parts = [
            jnp.einsum(
                "bhwo,bhwk->bok", hot16, (f * wgt).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            for f in (a, bb, d, qyp, qxp, ones)
        ]
        S = jnp.stack(parts, axis=-1)  # [b,oc,k,6]
        mass = jnp.maximum(S[..., 5], 1e-20)
        py, px = _pinv_2x2_solve(
            S[..., 0] / mass, S[..., 1] / mass, S[..., 2] / mass,
            S[..., 3] / mass, S[..., 4] / mass,
        )
        py = py + c0y[..., None]  # un-shift: p = p' + c0
        px = px + c0x[..., None]
        pts = jnp.stack([py, px], axis=-1).astype(jnp.float32)
        return pts * jnp.float32(h)
    if form == "concat":
        # Channel-blocked layout: [b,h,w,6k] with 6 contiguous k-blocks.
        # The [..,k,6] stack lowers to chained full-buffer
        # dynamic-update-slices (measured ~13 GB/step of copy traffic at
        # B16 480x640, benchmarks/hbm_bytes.py); a channel concat of
        # elementwise producers fuses into single-write regions.
        feats_ck = jnp.concatenate(
            [a * wgt, bb * wgt, d * wgt, qy * wgt, qx * wgt, wgt], axis=-1
        )  # [b,h,w,6k]
        S = jnp.einsum(
            "bhwo,bhwf->bof",
            hot,
            feats_ck,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).reshape(b, oc, 6, k).transpose(0, 1, 3, 2)
    elif form == "multi":
        # Six independent [oc,P]x[P,k] contractions sharing the hot mask:
        # no 6k-wide buffer at all; each [b,h,w,k] operand is 1/6 the size.
        parts = [
            jnp.einsum(
                "bhwo,bhwk->bok", hot, f * wgt,
                preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
            )
            for f in (a, bb, d, qy, qx, ones)
        ]
        S = jnp.stack(parts, axis=-1)  # [b,oc,k,6] (tiny)
    else:
        feats = jnp.stack([a, bb, d, qy, qx, ones], axis=-1) * wgt[..., None]  # [b,h,w,k,6]
        S = jnp.einsum(
            "bhwo,bhwkf->bokf",
            hot,
            feats,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

    mass = jnp.maximum(S[..., 5], 1e-20)
    Sa, Sb, Sd = S[..., 0] / mass, S[..., 1] / mass, S[..., 2] / mass
    Sqy, Sqx = S[..., 3] / mass, S[..., 4] / mass
    py, px = _pinv_2x2_solve(Sa, Sb, Sd, Sqy, Sqx)
    pts = jnp.stack([py, px], axis=-1).astype(jnp.float32)  # [b,oc,k,2]
    return pts * jnp.float32(h)
