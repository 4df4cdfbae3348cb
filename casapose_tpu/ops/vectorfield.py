"""On-device ground-truth keypoint vector-field generation.

Equivalent of the reference's ``compute_vertex_hcoords_batch_v3`` /
``get_all_vectorfields`` (casapose/utils/image_utils.py:16-79), which run
inside the train/test step: for every foreground pixel, the unit direction
from the pixel center to each of its object's keypoints, with multi-instance
pixels assigned to the nearest instance center.

Conventions preserved from the reference:
  * keypoints arrive in (y, x) order; grid coordinates are pixel centers
    (+0.5); output fields are (dy, dx) pairs, L2-normalized.
  * background pixels are zero.
"""

import jax.numpy as jnp

from casapose_tpu.core.numerics import safe_l2_normalize


def compute_vertex_vectorfield(mask, coords, use_motion=False):
    """Per-pixel keypoint directions.

    Args:
      mask:   [b, h, w, 1] integer labels (0 = background, k = object k,
              indexing into the object axis of ``coords`` after the implicit
              background row).
      coords: [b, c, o, m, 2] keypoints, (y, x); c objects, o instances,
              m keypoints.
      use_motion: if True skip normalization (raw offsets).
    Returns:
      [b, h, w, m*2] direction field, (dy, dx) per keypoint.
    """
    b, h, w, _ = mask.shape
    c = coords.shape[1]
    o = coords.shape[2]
    m = coords.shape[3]
    dtype = coords.dtype

    labels = mask[..., 0].astype(jnp.int32)  # [b,h,w]
    # Per-pixel object selection as a one-hot contraction: a
    # take_along_axis over a pixel-broadcast coords tensor materializes a
    # gigabyte-scale gather operand; the [P, C] x [C, o*m*2] matmul form is
    # a few MXU tiles instead. Label 0 (background) selects nothing.
    onehot = (labels[..., None] == (jnp.arange(c, dtype=jnp.int32) + 1)[None, None, None]).astype(dtype)
    coords_on_mask = jnp.einsum(
        "bhwc,bcf->bhwf", onehot, coords.reshape(b, c, o * m * 2)
    ).reshape(b, h, w, o, m, 2)

    gy = (jnp.arange(h, dtype=dtype) + 0.5)[None, :, None]
    gx = (jnp.arange(w, dtype=dtype) + 0.5)[None, None, :]
    grid = jnp.stack([jnp.broadcast_to(gy, (b, h, w)), jnp.broadcast_to(gx, (b, h, w))], axis=-1)  # [b,h,w,2]

    if o > 1:
        # Nearest-instance-center assignment (first keypoint = center).
        centers = coords_on_mask[:, :, :, :, 0]  # [b,h,w,o,2]
        grid_dist = jnp.linalg.norm(grid[:, :, :, None] - centers, axis=-1)  # [b,h,w,o]
        closest = jnp.argmin(grid_dist, axis=-1)
        inst_onehot = (closest[..., None] == jnp.arange(o)[None, None, None]).astype(dtype)
        kp = jnp.einsum("bhwo,bhwomd->bhwmd", inst_onehot, coords_on_mask)
    else:
        kp = coords_on_mask[:, :, :, 0]  # [b,h,w,m,2]

    dirs = kp - grid[:, :, :, None]  # [b,h,w,m,2]
    dirs = dirs * (labels != 0)[..., None, None].astype(dtype)
    if not use_motion:
        dirs = safe_l2_normalize(dirs, axis=-1)
    return dirs.reshape(b, h, w, m * 2)


def get_all_vectorfields(target_seg, target_vertex, filtered_seg, separated_vectorfields):
    """GT direction fields for the whole batch.

    Args:
      target_seg:    [b, h, w, 1+oc] one-hot segmentation.
      target_vertex: [b, oc, ic, m, 2] GT keypoints (y, x).
      filtered_seg:  [b, h, w, 1] integer label map.
      separated_vectorfields: pvnet mode — one field stack per object,
        concatenated along channels.
    Returns:
      [b, h, w, m*2] (or [b, h, w, oc*m*2] in pvnet mode).
    """
    if separated_vectorfields:
        fields = []
        for idx in range(target_seg.shape[3] - 1):
            # Per-object binary mask (one-hot channel) indexes a 1-object
            # coords array, matching the reference's per-object calls.
            mask = target_seg[:, :, :, idx + 1 : idx + 2].astype(jnp.int32)
            fields.append(compute_vertex_vectorfield(mask, target_vertex[:, idx : idx + 1]))
        return jnp.concatenate(fields, axis=3)
    return compute_vertex_vectorfield(filtered_seg, target_vertex)
