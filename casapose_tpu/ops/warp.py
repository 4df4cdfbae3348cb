"""Device-side batched affine image warp (tfa.image.transform equivalent).

The host pipeline uses cv2 for geometric augmentation; this op provides the
same dst->src projective-transform semantics on device
(vectorfield_dataset.py:203-204) so the whole augmentation can run inside
the jit step when host CPU becomes the bottleneck.
"""

import jax.numpy as jnp


def affine_warp(images, transforms, interpolation="bilinear", fill_value=0.0):
    """Warp a batch of images with per-image dst->src transforms.

    Args:
      images: [b, h, w, c] float or uint8.
      transforms: [b, 8] projective transform rows [a0,a1,a2,b0,b1,b2,c0,c1]
        (tfa convention: output (x, y) samples input at
        ((a0 x + a1 y + a2) / k, (b0 x + b1 y + b2) / k),
        k = c0 x + c1 y + 1) — or [b, 3, 3] matrices.
      interpolation: "bilinear" or "nearest".
    Returns: warped images, same shape/dtype family (float32).
    """
    b, h, w, c = images.shape
    dtype = jnp.float32
    imgs = images.astype(dtype)
    if transforms.shape[-1] == 8:
        t = jnp.concatenate([transforms, jnp.ones((b, 1), dtype)], axis=1).reshape(b, 3, 3)
    else:
        t = transforms.reshape(b, 3, 3).astype(dtype)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # [P, 3] (x, y, 1)
    src = jnp.einsum("bij,pj->bpi", t, dst)  # [b, P, 3]
    k = jnp.where(src[..., 2:] == 0, 1.0, src[..., 2:])
    sx = src[..., 0] / k[..., 0]
    sy = src[..., 1] / k[..., 0]

    def sample(ix, iy):
        # Out-of-range taps contribute the fill value (cv2/tfa border
        # convention), not an edge-clamped sample.
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        flat = imgs.reshape(b, h * w, c)
        idx = (iyc * w + ixc).astype(jnp.int32)
        tap = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid[..., None], tap, fill_value)

    inside = (sx > -1) & (sx < w) & (sy > -1) & (sy < h)
    if interpolation == "nearest":
        out = sample(jnp.round(sx), jnp.round(sy))
    else:
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        out = (
            sample(x0, y0) * (1 - fx) * (1 - fy)
            + sample(x0 + 1, y0) * fx * (1 - fy)
            + sample(x0, y0 + 1) * (1 - fx) * fy
            + sample(x0 + 1, y0 + 1) * fx * fy
        )
    out = jnp.where(inside[..., None], out, fill_value)
    return out.reshape(b, h, w, c)
