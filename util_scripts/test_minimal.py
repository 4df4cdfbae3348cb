#!/usr/bin/env python
"""Minimal inference latency benchmark (net -> LS voting -> PnP).

Rebuild of the reference's util_scripts/test_minimal.py:160-207: stream
images only, run the full inference pipeline (network, filtered LS voting,
on-device PnP), time each batch after device sync, write speed_eval.csv and
report the mean over batches 10+.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.data.image_only import ImageOnlyDataset
from casapose_tpu.data.ndds import VectorfieldDataset
from casapose_tpu.ops.voting import ls_voting
from casapose_tpu.pose.evaluation import poses_pnp
from casapose_tpu.train import build_model_from_opt, init_model
from casapose_tpu.utils.config import parse_config


def main():
    import os

    # The environment's experimental TPU plugin ignores the JAX_PLATFORMS
    # env var; apply it via jax.config (same workaround as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    opt = parse_config()
    objectsofinterest = [x.strip() for x in opt.object.split(",")]
    no_objects = len(objectsofinterest)
    k = opt.no_points
    seg_dim = 1 + no_objects

    images = ImageOnlyDataset(root=opt.datatest)
    stream, batches = images.generate_dataset(batchsize=1)

    # Keypoints + camera from one VectorfieldDataset batch (ref :201-207).
    meta_dataset = VectorfieldDataset(
        root=opt.datatest,
        path_meshes=opt.datameshes,
        path_filter_root=opt.datatest_path_filter,
        color_input=opt.color_dataset,
        no_points=k,
        objectsofinterest=objectsofinterest,
        random_translation=(0, 0),
        random_rotation=0,
        random_crop=False,
    )
    it, _ = meta_dataset.generate_dataset(1, 1, 2, opt.imagesize_test, 1.0, 2, no_objects, shuffle=False)
    meta = it.get_next()
    it.close()
    keypoints3d = jnp.asarray(meta["keypoints3d"])
    camera = jnp.asarray(meta["camera"])

    model = build_model_from_opt(opt, no_objects)
    variables = init_model(model, opt.imagesize_test, False, seed=opt.manualseed)
    if opt.load_h5_weights:
        from casapose_tpu.core.checkpoint import import_keras_h5, load_weights_npz

        fname = opt.load_h5_filename
        if os.path.exists(fname + ".npz"):
            variables, n, _ = load_weights_npz(fname + ".npz", variables)
        elif os.path.exists(fname + ".h5"):
            variables, n, _ = import_keras_h5(fname + ".h5", variables)

    @jax.jit
    def test_step(variables, img):
        out = model.apply(variables, img, train=False)
        seg = out[..., :seg_dim]
        dirs = out[..., seg_dim : seg_dim + 2 * k]
        conf = out[..., seg_dim + 2 * k :]
        coords = ls_voting(seg, dirs, conf, num_points=k, filter_estimates=True, raw_output=out)
        poses = poses_pnp(coords, seg, keypoints3d, camera, no_objects)
        return poses

    os.makedirs(opt.evalf, exist_ok=True)
    csv_path = os.path.join(opt.evalf, "speed_eval.csv")
    with open(csv_path, "w") as f:
        f.write("batchid,time\n")

    times = []
    for batch_idx, img in enumerate(stream):
        img = jnp.asarray(img)
        t0 = time.time()
        poses = test_step(variables, img)
        poses.block_until_ready()
        dt = time.time() - t0
        times.append(dt)
        with open(csv_path, "a") as f:
            f.write(f"{batch_idx + 1},{dt:.6f}\n")

    # Short runs: skip the compile batch instead of averaging it in.
    mean_time = float(np.mean(times[10:])) if len(times) > 10 else float(np.mean(times[1:])) if len(times) > 1 else float(times[0])
    print(f"mean time (batches 10+): {mean_time:.6f} s -> {1.0 / mean_time:.2f} images/sec")
    with open(csv_path, "a") as f:
        f.write(f"mean,{mean_time:.6f}\n")


if __name__ == "__main__":
    main()
