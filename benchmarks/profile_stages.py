#!/usr/bin/env python
"""Stage-level throughput profiler for the inference pipeline.

Usage: python benchmarks/profile_stages.py [model|vote|filt|full] ...

Methodology (important on the axon TPU tunnel): dispatches are pipelined
and synchronized once with a host fetch; ``block_until_ready`` alone is
optimistic through the tunnel and under-reports. Compilation results are
persisted in .jax_cache.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(stages):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from casapose_tpu.models.registry import get_model
    from casapose_tpu.ops.voting import ls_voting
    from casapose_tpu.pose.evaluation import poses_pnp

    no_objects, k = 8, 9
    seg_dim = 1 + no_objects
    h, w, B = 480, 640, 4
    dt = jnp.bfloat16 if os.environ.get("CASAPOSE_MODEL_DTYPE") == "bfloat16" else None
    model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=seg_dim, dtype=dt)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32))
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img[:1])
    kp3 = jnp.asarray(rng.uniform(-0.05, 0.05, (B, no_objects, 1, k, 3)).astype(np.float32))
    cam = jnp.asarray(np.tile(np.array([[572.4, 0, 325.0], [0, 573.5, 242.0], [0, 0, 1]], np.float32), (B, 1, 1)))

    def split(out):
        return out[..., :seg_dim], out[..., seg_dim : seg_dim + 2 * k], out[..., seg_dim + 2 * k :]

    @jax.jit
    def s_model(v, x):
        return jnp.sum(model.apply(v, x, train=False))

    @jax.jit
    def s_vote(v, x):
        seg, dirs, conf = split(model.apply(v, x, train=False))
        return jnp.sum(ls_voting(seg, dirs, conf, num_points=k))

    @jax.jit
    def s_filt(v, x):
        seg, dirs, conf = split(model.apply(v, x, train=False))
        return jnp.sum(ls_voting(seg, dirs, conf, num_points=k, filter_estimates=True))

    @jax.jit
    def s_full(v, x):
        seg, dirs, conf = split(model.apply(v, x, train=False))
        coords = ls_voting(seg, dirs, conf, num_points=k, filter_estimates=True)
        return jnp.sum(poses_pnp(coords, seg, kp3, cam, no_objects))

    fns = {"model": s_model, "vote": s_vote, "filt": s_filt, "full": s_full}
    for stage in stages:
        fn = fns[stage]
        np.asarray(fn(variables, img))  # compile + sync
        t0 = time.perf_counter()
        outs = [fn(variables, img) for _ in range(30)]
        np.asarray(outs[-1])
        for o in outs:
            o.block_until_ready()
        dtm = (time.perf_counter() - t0) / 30
        print(f"{stage}: {dtm * 1000:.2f}ms/batch -> {B / dtm:.1f} img/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["model", "vote", "filt", "full"])
