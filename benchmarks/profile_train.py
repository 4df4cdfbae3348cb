#!/usr/bin/env python
"""Training-step throughput probe (synthetic batch, single chip).

Measures the full jit train step (device finishing -> GT vector fields ->
forward -> LS voting -> keypoint reprojection loss incl. BPnP-free pose
terms -> composite loss -> grads -> Adam update) at the reference training
configuration (448x448, batch from CASAPOSE_TRAIN_BATCH, default 8).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
        compute_dtype = os.environ.get("CASAPOSE_TRAIN_DTYPE", "float32")

    B = int(os.environ.get("CASAPOSE_TRAIN_BATCH", "8"))
    h = w = 448
    no_objects, k = 8, 9
    model = build_model_from_opt(Opt(), no_objects)
    rng = np.random.default_rng(0)

    img0 = jnp.zeros((1, h, w, 3), jnp.float32)
    gt0 = jnp.zeros((1, h, w, 1 + no_objects), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img0, gt0)

    mesh = make_mesh(batch_size=B)
    tx = optax.adam(1e-3)
    params = shard_params(mesh, variables["params"])
    batch_stats = shard_params(mesh, variables.get("batch_stats", {}))
    state = TrainState(params=params, batch_stats=batch_stats, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))

    est_coords = os.environ.get("CASAPOSE_TRAIN_COORDS", "1") == "1"
    cfg = StepConfig(
        no_objects=no_objects, no_points=k, estimate_confidence=True, estimate_coords=est_coords,
        train_vectors_with_ground_truth=True, use_bpnp_reprojection_loss=False,
        confidence_regularization=True, separated_vectorfields=False, max_keypoint_pixel_error=12.5,
        noise=0.0001, brightness=0.001, contrast=0.001, saturation=0.001, hue=0.001, use_imgaug=True,
    )
    lw = LossWeights(filter_vertex_with_segmentation=True)
    step = build_train_step(model, tx, cfg, lw)

    labels = rng.integers(0, no_objects + 1, (B, h, w, 1)).astype(np.uint8)
    batch = {
        "img": rng.integers(0, 255, (B, h, w, 3)).astype(np.uint8),
        "seg": labels,
        "keypoints2d": rng.uniform(0, h, (B, no_objects, 1, k, 2)).astype(np.float32),
        "keypoints3d": rng.uniform(-0.05, 0.05, (B, no_objects, 1, k, 3)).astype(np.float32),
        "camera": np.tile(np.array([[572.0, 0, w / 2], [0, 572.0, h / 2], [0, 0, 1]], np.float32), (B, 1, 1)),
        "diameters": np.full((B, no_objects, 1, 1), 0.1, np.float32),
        "offsets": np.tile(np.array([0, 0, h, w, 0, 0, 0, 1.0, w, h], np.float32), (B, 1)),
        "cuboid3d": np.zeros((B, no_objects, 1, 8, 3), np.float32),
        "poses_gt": np.tile(
            np.concatenate([np.eye(3, dtype=np.float32), [[0], [0], [0.8]]], axis=1), (B, no_objects, 1, 1, 1)
        ),
        "pixel_gt_count": np.full((B, no_objects, 1, 1), 100, np.float32),
    }
    dev_batch = shard_batch(mesh, batch)
    rngk = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, losses = step(state, dev_batch, rngk)
    np.asarray(losses)
    print(f"train step compile+1: {time.perf_counter() - t0:.1f}s losses={np.asarray(losses)}", flush=True)

    # Dispatch warmup: the first ~10 post-compile calls through the axon
    # tunnel carry residual queue/rebind costs (measured 5-10x inflation);
    # steady state only emerges after a full warmup loop.
    for _ in range(10):
        state, losses = step(state, dev_batch, rngk)
    np.asarray(losses)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, dev_batch, rngk)
    np.asarray(losses)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt * 1000:.1f}ms/step -> {B / dt:.1f} img/s", flush=True)

    # Loader-in-the-loop: point CASAPOSE_TRAIN_DATA at an NDDS tree to feed
    # the step from the threaded host pipeline instead of a static batch
    # (quantifies the host-feed share of the step time).
    data_root = os.environ.get("CASAPOSE_TRAIN_DATA")
    if data_root:
        from casapose_tpu.data.ndds import VectorfieldDataset
        from casapose_tpu.data.pipeline import make_dataset

        meshes = os.environ.get("CASAPOSE_TRAIN_MESHES", os.path.join(data_root, "..", "models"))
        objects = sorted(os.listdir(meshes))
        objects = [o_ for o_ in objects if o_.startswith("obj")]
        ds = VectorfieldDataset(
            root=data_root, path_meshes=meshes, objectsofinterest=objects, no_points=k,
            color_input=True, random_crop=False, random_translation=(0, 0), random_rotation=0,
            record_cache_dir=os.environ.get("CASAPOSE_TRAIN_CACHE"),
        )
        it, nb = make_dataset(ds, B, 1000, 4, [h, w], 1.0, 8, len(objects), shuffle=True, seed=0)

        def fetch():
            b = it.get_next()
            b.pop("image_id", None)
            return shard_batch(mesh, b)

        # loader-only rate
        t0 = time.perf_counter()
        for _ in range(iters):
            fetch()
        loader_dt = (time.perf_counter() - t0) / iters
        print(f"loader alone: {loader_dt * 1000:.1f}ms/batch -> {B / loader_dt:.1f} img/s", flush=True)

        for _ in range(3):  # re-warm with loader-shaped batches
            state, losses = step(state, fetch(), rngk)
        np.asarray(losses)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = step(state, fetch(), rngk)
        np.asarray(losses)
        dt_l = (time.perf_counter() - t0) / iters
        it.close()
        print(
            f"train step + loader: {dt_l * 1000:.1f}ms/step -> {B / dt_l:.1f} img/s "
            f"(host-feed overhead {max(dt_l - dt, 0) * 1000:.1f}ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
