#!/usr/bin/env python
"""Probe: does XLA:TPU run s8xs8->s32 convolutions on the MXU int8 path?

The inference pipeline is bandwidth-bound at bf16 (DESIGN.md §7); int8
activations would halve the dominant byte traffic and v5e's MXU has a
2x-rate int8 mode. This probe times a representative mid-network conv
(the stride-8 backbone trunk shape) in bf16 vs int8 and prints the ratio,
deciding whether a quantized inference mode is worth building.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from casapose_tpu.core.cache import setup_compilation_cache

    setup_compilation_cache()
    rng = np.random.default_rng(0)
    # Trunk shape: 60x80 spatial, 256->256 channels, 3x3 (the stride-8
    # decoder/backbone workhorse), batch 16 as in bench.py.
    B, H, W, C = 16, 60, 80, 256
    x_f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    w_f = (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)
    x8 = np.clip(np.round(x_f * 16), -127, 127).astype(np.int8)
    w8 = np.clip(np.round(w_f * 512), -127, 127).astype(np.int8)

    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def conv_int8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn, preferred_element_type=jnp.int32
        )

    @jax.jit
    def conv_int8_dyn(x, w):
        # Full dynamic-quant round trip: f32 in -> absmax -> int8 conv -> f32 out.
        s = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, w, (1, 1), "SAME", dimension_numbers=dn, preferred_element_type=jnp.int32
        )
        return acc.astype(jnp.float32) * s

    xd, wd = jnp.asarray(x_f), jnp.asarray(w_f)
    x8d, w8d = jnp.asarray(x8), jnp.asarray(w8)
    t_bf = time_fn(conv_bf16, xd, wd)
    flops = 2 * B * H * W * C * C * 9
    print(f"bf16  conv: {t_bf*1e6:8.1f} us  {flops/t_bf/1e12:6.1f} TFLOP/s")
    try:
        t_i8 = time_fn(conv_int8, x8d, w8d)
        print(f"int8  conv: {t_i8*1e6:8.1f} us  {flops/t_i8/1e12:6.1f} TOP/s  ratio bf16/int8 = {t_bf/t_i8:.2f}x")
        t_dyn = time_fn(conv_int8_dyn, xd, w8d)
        print(f"int8+dynq : {t_dyn*1e6:8.1f} us  ratio bf16/(int8+dynq) = {t_bf/t_dyn:.2f}x")
    except Exception as e:  # noqa: BLE001 — unsupported path is a valid probe outcome
        print(f"int8 conv unsupported: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
