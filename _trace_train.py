import os, sys, glob, gzip, json, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Rebuild the same train-step setup as benchmarks/profile_train.py
exec(open("/root/repo/benchmarks/profile_train.py").read().split('def main():')[0])
import jax.numpy as jnp, optax
from casapose_tpu.losses.losses import LossWeights
from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from casapose_tpu.train import StepConfig, TrainState, build_model_from_opt, build_train_step
from functools import partial

class Opt:
    modelname = "casapose_c_gcu5"; backbonename = "resnet18"; no_points = 9; estimate_confidence = True
B, h, w, no_objects, k = 8, 448, 448, 8, 9
model = build_model_from_opt(Opt(), no_objects)
rng = np.random.default_rng(0)
img0 = jnp.zeros((1,h,w,3), jnp.float32); gt0 = jnp.zeros((1,h,w,1+no_objects), jnp.float32)
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img0, gt0)
mesh = make_mesh(batch_size=B)
tx = optax.adam(1e-3)
params = shard_params(mesh, variables["params"]); bs = shard_params(mesh, variables.get("batch_stats", {}))
state = TrainState(params=params, batch_stats=bs, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))
cfg = StepConfig(no_objects=no_objects, no_points=k, estimate_confidence=True, estimate_coords=True,
    train_vectors_with_ground_truth=True, use_bpnp_reprojection_loss=False, confidence_regularization=True,
    separated_vectorfields=False, max_keypoint_pixel_error=12.5, noise=0.0001, brightness=0.001,
    contrast=0.001, saturation=0.001, hue=0.001, use_imgaug=True)
step = build_train_step(model, tx, cfg, LossWeights(filter_vertex_with_segmentation=True))
labels = rng.integers(0, no_objects+1, (B,h,w,1)).astype(np.uint8)
batch = {"img": rng.integers(0,255,(B,h,w,3)).astype(np.uint8), "seg": labels,
    "keypoints2d": rng.uniform(0,h,(B,no_objects,1,k,2)).astype(np.float32),
    "keypoints3d": rng.uniform(-0.05,0.05,(B,no_objects,1,k,3)).astype(np.float32),
    "camera": np.tile(np.array([[572.,0,224],[0,572.,224],[0,0,1]],np.float32),(B,1,1)),
    "diameters": np.full((B,no_objects,1,1),0.1,np.float32),
    "offsets": np.tile(np.array([0,0,h,w,0,0,0,1.0,w,h],np.float32),(B,1)),
    "cuboid3d": np.zeros((B,no_objects,1,8,3),np.float32),
    "poses_gt": np.tile(np.concatenate([np.eye(3,dtype=np.float32),[[0],[0],[0.8]]],axis=1),(B,no_objects,1,1,1)),
    "pixel_gt_count": np.full((B,no_objects,1,1),100,np.float32)}
dev_batch = shard_batch(mesh, batch)
rngk = jax.random.PRNGKey(0)
state, losses = step(state, dev_batch, rngk); np.asarray(losses)
print("compiled", flush=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    state, losses = step(state, dev_batch, rngk)
    np.asarray(losses)
print("traced", flush=True)
# Parse the trace: sum durations by event name on device tracks.
files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    data = json.load(gzip.open(f))
    ev += data.get("traceEvents", [])
from collections import Counter
dur = Counter()
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        pidname = e.get("pid")
        dur[e.get("name","?")[:80]] += e["dur"]
for name, d in dur.most_common(25):
    print(f"{d/1000.0:10.1f}ms  {name}", flush=True)
