#!/usr/bin/env python
"""Remat (jax.checkpoint) train-step experiment: time and peak-HBM scan.

The train step is bandwidth-bound (DESIGN.md §7); rematerializing the
network forward in the backward pass trades one extra forward of compute
for not storing conv activations between fwd and bwd. That can cut peak
HBM enough to admit larger per-chip batches — which matters because
throughput scales sub-linearly but positively with batch (48.5 img/s @8
-> 60 @32). This script measures ms/step and device peak bytes for
remat on/off across a batch scan.

Usage: CASAPOSE_REMAT_BATCHES=8,32,64 python benchmarks/profile_remat.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from __graft_entry__ import make_synthetic_batch


def make_batch(rng, B, h, w, no_objects, k):
    return make_synthetic_batch(rng, B, h, w, no_objects, k)


def peak_bytes():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0)
    except Exception:
        return 0


def main():
    import jax

    from casapose_tpu.core.cache import setup_compilation_cache

    setup_compilation_cache()
    import jax.numpy as jnp
    import optax

    from casapose_tpu.losses.losses import LossWeights
    from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from casapose_tpu.train import StepConfig, TrainState, build_model_from_opt, build_train_step

    class Opt:
        modelname = "casapose_c_gcu5"
        backbonename = "resnet18"
        no_points = 9
        estimate_confidence = True
        compute_dtype = os.environ.get("CASAPOSE_TRAIN_DTYPE", "bfloat16")

    h = w = 448
    no_objects, k = 8, 9
    model = build_model_from_opt(Opt(), no_objects)
    rng = np.random.default_rng(0)
    img0 = jnp.zeros((1, h, w, 3), jnp.float32)
    gt0 = jnp.zeros((1, h, w, 1 + no_objects), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img0, gt0)
    # Host copies: the train step donates its state, and shard_params is a
    # no-op (returns the same array) when the sharding already matches — so
    # re-sharding the donated originals raises "Array has been deleted".
    host_params = jax.device_get(variables["params"])
    host_bst = jax.device_get(variables.get("batch_stats", {}))
    tx = optax.adam(1e-3)
    rngk = jax.random.PRNGKey(0)

    batches = [int(b) for b in os.environ.get("CASAPOSE_REMAT_BATCHES", "8,32,64").split(",")]
    for B in batches:
        batch = make_batch(rng, B, h, w, no_objects, k)
        for remat in (False, True):
            mesh = make_mesh(batch_size=B)
            params = shard_params(mesh, host_params)
            bst = shard_params(mesh, host_bst)
            state = TrainState(
                params=params, batch_stats=bst, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32)
            )
            cfg = StepConfig(
                no_objects=no_objects, no_points=k, estimate_confidence=True, estimate_coords=True,
                train_vectors_with_ground_truth=True, use_bpnp_reprojection_loss=False,
                confidence_regularization=True, separated_vectorfields=False,
                max_keypoint_pixel_error=12.5, noise=0.0001, brightness=0.001, contrast=0.001,
                saturation=0.001, hue=0.001, use_imgaug=True, remat=remat,
            )
            step = build_train_step(model, tx, cfg, LossWeights(filter_vertex_with_segmentation=True))
            dev_batch = shard_batch(mesh, batch)
            try:
                state, losses = step(state, dev_batch, rngk)
                np.asarray(losses)
            except Exception as e:  # noqa: BLE001 — OOM reporting is the point
                print(f"B={B:3d} remat={int(remat)}  FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            for _ in range(10):
                state, losses = step(state, dev_batch, rngk)
            np.asarray(losses)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    state, losses = step(state, dev_batch, rngk)
                np.asarray(losses)
                best = min(best, (time.perf_counter() - t0) / 10)
            print(
                f"B={B:3d} remat={int(remat)}  {best*1e3:7.1f} ms/step  {B/best:6.1f} img/s  "
                f"peak {peak_bytes()/2**30:.2f} GiB",
                flush=True,
            )
            del state, step, dev_batch


if __name__ == "__main__":
    main()
