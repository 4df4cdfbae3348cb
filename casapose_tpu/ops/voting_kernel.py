"""Pallas kernel: fused LS-voting accumulation.

The XLA formulation of :func:`casapose_tpu.ops.voting.ls_voting`
materializes the per-pixel feature tensor ``w*[a,b,d,qy,qx,1]`` at
``[b, h, w, k, 6]`` float32 (~1 GB at the bench configuration) plus layout
copies before the MXU contraction — measured at ~50 ms of a 222 ms
inference step (22%). This kernel fuses the whole per-pixel pipeline:

    raw net output channels -> direction normalization -> softplus
    confidence -> normal-equation features -> per-class accumulation

into ONE pass: each grid program reads a row-tile of the raw ``[h, w, C]``
network output and the filtered label map, builds the 54 feature rows in a
``[64, P]`` VMEM scratch (row-contiguous stores), and contracts against the
one-hot class matrix with a single MXU ``dot`` — no [b,h,w,k,6] tensor ever
exists in HBM. Per-tile partials are summed by XLA (tiny) and fed to the
same normalization + 2x2 solve as the XLA path.

Replaces the float64 reduction of the reference
(casapose/pose_estimation/voting_layers_2d.py:83-122); equivalence with
the XLA path (and hence with the float64 reference, tests/test_tf_parity)
is pinned in tests/test_voting_kernel.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softplus(x):
    """Numerically stable log(1 + exp(x)) (== jnp.logaddexp(x, 0))."""
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _voting_accumulate_kernel(
    out_ref,  # [1, th, w, C] raw net output (f32)
    labels_ref,  # [1, th, w] filtered int32 class labels (0 = background)
    part_ref,  # [1, 1, oc_pad, kf_pad] output partials
    feat_ref,  # [kf_pad, th, w] VMEM scratch
    *,
    seg_dim,
    k,
    oc,
    th,
    w,
    img_h,
):
    # Mosaic-friendly: every array stays 2-D-sliceable (no reshapes); the
    # per-class contraction is a row-loop of [oc_pad, w] x [kf_pad, w]
    # MXU dots contracting over the lane dimension.
    row0 = pl.program_id(1) * th

    ry = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0).astype(jnp.float32)
    rx = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)
    # Pixel-center coordinates, both normalized by IMAGE HEIGHT (the
    # reference's quirk, voting_layers_2d.py:96-97).
    cy = (ry + (row0 + 0.5)) / img_h
    cx = (rx + 0.5) / img_h

    for j in range(k):
        dy = out_ref[0, :, :, seg_dim + 2 * j]
        dx = out_ref[0, :, :, seg_dim + 2 * j + 1]
        conf = out_ref[0, :, :, seg_dim + 2 * k + j]
        norm2 = dy * dy + dx * dx
        inv = jax.lax.rsqrt(jnp.maximum(norm2, 1e-30))
        good = norm2 > 0.0
        ny = jnp.where(good, dy * inv, 0.0)
        nx = jnp.where(good, dx * inv, 0.0)
        wgt = _softplus(conf)
        a = (1.0 - ny * ny) * wgt
        bb = (-ny * nx) * wgt
        d = (1.0 - nx * nx) * wgt
        qy = a * cy + bb * cx
        qx = bb * cy + d * cx
        for f, val in enumerate((a, bb, d, qy, qx, wgt)):
            feat_ref[j * 6 + f, :, :] = val

    kf_pad = feat_ref.shape[0]
    zeros = jnp.zeros((th, w), jnp.float32)
    for extra in range(k * 6, kf_pad):
        feat_ref[extra, :, :] = zeros

    oc_pad = part_ref.shape[2]
    class_ids = jax.lax.broadcasted_iota(jnp.int32, (oc_pad, w), 0) + 1
    acc = jnp.zeros((oc_pad, kf_pad), jnp.float32)
    for r in range(th):
        labels_row = labels_ref[0, r : r + 1, :]  # [1, w]
        hot_ow = (class_ids == labels_row).astype(jnp.float32)  # [oc_pad, w]
        feat_slab = feat_ref[:, r, :]  # [kf_pad, w]
        acc = acc + jax.lax.dot_general(
            hot_ow,
            feat_slab,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    part_ref[0, 0] = acc


@partial(jax.jit, static_argnames=("seg_dim", "num_points", "row_tile", "interpret"))
def voting_accumulate_pallas(output_net, labels, seg_dim, num_points, row_tile=16, interpret=False):
    """Fused voting accumulation.

    Args:
      output_net: [b, h, w, C] float32 raw network output
        (``[seg | dirs | conf]`` channel layout).
      labels: [b, h, w] int32 filtered class labels (0 = background).
    Returns:
      S: [b, oc, k, 6] float32 sums of ``w*[a, b, d, qy, qx, 1]`` per class.
    """
    b, h, w, c = output_net.shape
    k = num_points
    oc = seg_dim - 1
    th = row_tile
    assert h % th == 0, f"height {h} not divisible by row tile {th}"
    n_tiles = h // th
    kf_pad = -(-(k * 6) // 8) * 8  # sublane-pad the feature rows
    oc_pad = max(-(-oc // 8) * 8, 8)

    partials = pl.pallas_call(
        partial(
            _voting_accumulate_kernel,
            seg_dim=seg_dim, k=k, oc=oc, th=th, w=w, img_h=float(h),
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, oc_pad, kf_pad), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, oc_pad, kf_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kf_pad, th, w), jnp.float32)],
        # The unrolled feature passes exceed the default 16 MB scoped-vmem
        # stack; v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(output_net, labels)
    S = jnp.sum(partials, axis=1)[:, :oc, : k * 6]  # [b, oc, k*6]
    return S.reshape(b, oc, k, 6)
