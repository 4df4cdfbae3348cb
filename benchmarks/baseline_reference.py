#!/usr/bin/env python
"""Measured baseline anchor: reference TF pipeline vs ours, same host CPU.

The reference repo publishes no speed numbers (BASELINE.md), so bench.py's
``vs_baseline`` needs a traceable anchor. This script measures, on the SAME
machine, the reference's minimal inference pipeline (test_minimal.py:160-195
semantics: net forward -> filtered LS voting -> poses_pnp) in TF-CPU against
our JAX-CPU equivalent, batch 1 at 480x640, and prints one JSON line:

  {"reference_tf_cpu_img_s": ..., "ours_jax_cpu_img_s": ..., "ratio": ...}

Interpretation: the CPU ratio anchors implementation overhead (graph
execution, host round-trips for cv2 PnP, unfused voting) independent of
accelerator generation. The A100 figure in bench.py remains an estimate,
but the reference's host-escape structure (cv2 PnP via numpy_function,
float64 voting reduce) caps its GPU throughput similarly.

Run: python benchmarks/baseline_reference.py [--batches 12] [--height 480]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF_SNIPPET = r"""
import json, os, sys, time
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.environ.get("CASAPOSE_REFERENCE_DIR", "/root/reference"))
from tools.run_reference_eval import _stub_tfa, _stub_trimesh, _stub_imgaug
_stub_tfa(); _stub_trimesh(); _stub_imgaug()
import numpy as np
import tensorflow as tf
from casapose.pose_models.tfkeras import Classifiers
from casapose.pose_estimation.voting_layers_2d import CoordLSVotingWeighted
from casapose.pose_estimation.pose_evaluation import poses_pnp

h, w, o, k = {height}, {width}, 8, 9
net = Classifiers.get("casapose_c_gcu5")(
    ver_dim=3 * k, seg_dim=1 + o, input_shape=(h, w, 3),
    input_segmentation_shape=None, weights=None, base_model="resnet18")
rng = np.random.default_rng(0)
img = tf.constant(rng.normal(size=(1, h, w, 3)).astype("float32"))
kp3d = tf.constant(rng.uniform(-0.05, 0.05, (1, o, 1, k, 3)).astype("float32"))
cam = tf.constant(np.tile(np.array([[572.4, 0, 325.3], [0, 573.5, 242.0], [0, 0, 1]], "float32"), (1, 1, 1)))

@tf.function
def step(img):
    out = net(img, training=False)
    seg, dirs, conf = tf.split(out, [1 + o, 2 * k, k], 3)
    coords = CoordLSVotingWeighted(
        name="coords_ls_voting", num_classes=o, num_points=k, filter_estimates=True)([seg, dirs, conf])
    return poses_pnp(coords, seg, kp3d, cam, o, min_num=200)

for _ in range({warmup}):  # trace + warmup
    step(img).numpy()
t0 = time.perf_counter()
for _ in range({batches}):
    step(img).numpy()
dt = time.perf_counter() - t0
print(json.dumps({{"img_s": {batches} / dt}}))
"""


def measure_reference(batches, warmup, height, width):
    code = REF_SNIPPET.format(repo=REPO, batches=batches, warmup=warmup, height=height, width=width)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3000, env=env)
    if proc.returncode != 0:
        raise RuntimeError(f"reference measurement failed: {proc.stderr[-800:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])["img_s"]


def measure_ours(batches, warmup, height, width):
    code = r"""
import json, os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, {repo!r})
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from functools import partial
from casapose_tpu.models.registry import get_model
from casapose_tpu.ops.voting import ls_voting
from casapose_tpu.pose.evaluation import poses_pnp

h, w, o, k = {height}, {width}, 8, 9
model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=1 + o)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype("float32"))
kp3d = jnp.asarray(rng.uniform(-0.05, 0.05, (1, o, 1, k, 3)).astype("float32"))
cam = jnp.asarray(np.tile(np.array([[572.4, 0, 325.3], [0, 573.5, 242.0], [0, 0, 1]], "float32"), (1, 1, 1)))
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img)

@jax.jit
def step(variables, img):
    out = model.apply(variables, img, train=False)
    seg = out[..., : 1 + o]
    dirs = out[..., 1 + o : 1 + o + 2 * k]
    conf = out[..., 1 + o + 2 * k :]
    coords = ls_voting(seg, dirs, conf, num_points=k, filter_estimates=True)
    return poses_pnp(coords, seg, kp3d, cam, o)

for _ in range({warmup}):
    np.asarray(step(variables, img)[0])
t0 = time.perf_counter()
for _ in range({batches}):
    np.asarray(step(variables, img)[0])
dt = time.perf_counter() - t0
print(json.dumps({{"img_s": {batches} / dt}}))
""".format(repo=REPO, batches=batches, warmup=warmup, height=height, width=width)
    env = dict(os.environ)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3000, env=env)
    if proc.returncode != 0:
        raise RuntimeError(f"jax-cpu measurement failed: {proc.stderr[-800:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])["img_s"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    args = p.parse_args()
    ref = measure_reference(args.batches, args.warmup, args.height, args.width)
    ours = measure_ours(args.batches, args.warmup, args.height, args.width)
    print(
        json.dumps(
            {
                "reference_tf_cpu_img_s": round(ref, 3),
                "ours_jax_cpu_img_s": round(ours, 3),
                "ratio": round(ours / ref, 3),
                "config": f"batch1 {args.height}x{args.width} net+filtered-voting+pnp, same host CPU",
            }
        )
    )


if __name__ == "__main__":
    main()
