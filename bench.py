#!/usr/bin/env python
"""Headline benchmark: images/sec/chip, 640x480 LMO 8-object inference.

Runs the full flagship inference pipeline (casapose_c_gcu5 forward ->
connected-component-filtered LS voting -> on-device EPnP+GN pose solve) on
synthetic 480x640 inputs (throughput is weight/data independent) and prints
ONE JSON line.

``vs_baseline`` is measured against A100_BASELINE_IMAGES_PER_SEC: the
reference repo publishes no speed numbers (BASELINE.md), so we use the
reference pipeline's batch-1 inference-rate class on A100-class hardware
(net + voting + host PnP at 480x640), estimated at 30 img/s, as the 1.0
mark. Replace with a measured value when a reference run is available.
"""

import json
import time

import numpy as np

A100_BASELINE_IMAGES_PER_SEC = 30.0
BATCH = 4
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from casapose_tpu.models.registry import get_model
    from casapose_tpu.ops.voting import ls_voting
    from casapose_tpu.pose.evaluation import poses_pnp

    no_objects, k = 8, 9
    seg_dim = 1 + no_objects
    h, w = 480, 640
    model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=seg_dim)

    from functools import partial

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(BATCH, h, w, 3)).astype(np.float32))
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img[:1])
    keypoints3d = jnp.asarray(rng.uniform(-0.05, 0.05, (BATCH, no_objects, 1, k, 3)).astype(np.float32))
    camera = jnp.asarray(
        np.tile(np.array([[572.4, 0, 325.3], [0, 573.5, 242.0], [0, 0, 1]], np.float32), (BATCH, 1, 1))
    )

    @jax.jit
    def step(variables, img):
        out = model.apply(variables, img, train=False)
        seg = out[..., :seg_dim]
        dirs = out[..., seg_dim : seg_dim + 2 * k]
        conf = out[..., seg_dim + 2 * k :]
        coords = ls_voting(seg, dirs, conf, num_points=k, filter_estimates=True)
        return poses_pnp(coords, seg, keypoints3d, camera, no_objects)

    for _ in range(WARMUP):
        step(variables, img).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step(variables, img).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    images_per_sec = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_640x480_lmo8_inference",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / A100_BASELINE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
