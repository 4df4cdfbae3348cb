#!/usr/bin/env python
"""Microbenchmark: dilated 3x3 conv vs its space-to-batch rewrite.

The stride-8 backbone runs layer3 at dilation 2 and layer4 at dilation 4
(models/resnet.py, mirroring reference casapose/networks/resnet.py's
output_stride=8 mode). If XLA:TPU lowers dilated convs with poor MXU
efficiency, rewriting them as space-to-batch -> dense conv -> batch-to-space
(the tf.nn.atrous_conv2d identity) is a pure-perf transform with identical
math. This microbench measures both forms at the shapes the flagship
actually runs (480x640 input -> 60x80 stride-8 feature maps, batch 16).

Usage: python benchmarks/profile_dilated.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def space_to_batch_conv(x, w, dilation):
    """Dilated SAME 3x3 conv via space-to-batch. x: [B,H,W,C], w: [3,3,C,O]."""
    import jax.numpy as jnp
    from jax import lax

    d = dilation
    b, h, wd, c = x.shape
    # pad H,W to multiples of d plus SAME halo of d on each side
    ph = (-h) % d
    pw = (-wd) % d
    x = jnp.pad(x, ((0, 0), (d, d + ph), (d, d + pw), (0, 0)))
    hb, wb = x.shape[1] // d, x.shape[2] // d
    # [B, hb, d, wb, d, C] -> [d, d, B, hb, wb, C] -> [d*d*B, hb, wb, C]
    x = x.reshape(b, hb, d, wb, d, c).transpose(2, 4, 0, 1, 3, 5).reshape(d * d * b, hb, wb, c)
    y = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(d, d, b, ho, wo, -1).transpose(2, 3, 0, 4, 1, 5).reshape(b, ho * d, wo * d, -1)
    return y[:, : h, : wd, :]


def dilated_conv(x, w, dilation):
    from jax import lax

    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bench(fn, *args, iters=30):
    import jax

    f = jax.jit(fn)
    out = f(*args)
    out.block_until_ready()
    for _ in range(5):
        out = f(*args)
    np.asarray(out[0, 0, 0, 0])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from casapose_tpu.core.cache import setup_compilation_cache

    setup_compilation_cache()

    rng = np.random.default_rng(0)
    B = int(os.environ.get("B", "16"))
    cases = [
        # (H, W, Cin, Cout, dilation) — flagship stride-8 shapes at 480x640
        (60, 80, 256, 256, 2),
        (60, 80, 512, 512, 4),
        (120, 160, 128, 128, 2),
    ]
    dt = jnp.bfloat16
    for h, w, ci, co, d in cases:
        x = jnp.asarray(rng.standard_normal((B, h, w, ci)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.01, dt)
        t_dil, y1 = bench(partial(dilated_conv, dilation=d), x, k)
        t_s2b, y2 = bench(partial(space_to_batch_conv, dilation=d), x, k)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
        gflop = 2 * B * h * w * 9 * ci * co / 1e9
        print(
            f"[{B}x{h}x{w}x{ci}->{co} d={d}] dilated {t_dil:7.2f} ms ({gflop/t_dil:6.1f} TFLOP/s)  "
            f"s2b {t_s2b:7.2f} ms ({gflop/t_s2b:6.1f} TFLOP/s)  max|diff|={err:.3e}"
        )


if __name__ == "__main__":
    main()
