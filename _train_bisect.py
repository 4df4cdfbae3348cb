import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, optax
from functools import partial
from casapose_tpu.train import build_model_from_opt

class Opt:
    modelname = "casapose_c_gcu5"; backbonename = "resnet18"; no_points = 9; estimate_confidence = True
B, h, w, no_objects = 8, 448, 448, 8
model = build_model_from_opt(Opt(), no_objects)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B,h,w,3)).astype(np.float32))
gt = jax.nn.one_hot(jnp.asarray(rng.integers(0,9,(B,h,w))), 9)
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img[:1], gt[:1])
params = variables["params"]; bs = variables["batch_stats"]
which = sys.argv[1]

if which == "fwd":
    @jax.jit
    def f(p, img, gt):
        out, mut = model.apply({"params": p, "batch_stats": bs}, img, gt, train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)
    fn = f
elif which == "grad":
    @jax.jit
    def f(p, img, gt):
        def loss(p):
            out, mut = model.apply({"params": p, "batch_stats": bs}, img, gt, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)
        return jax.grad(loss)(p)["pv_final_conv_vertex"]["kernel"]
    fn = f
elif which == "grad_backbone":
    from casapose_tpu.models.resnet import ResNetBackbone
    bb = ResNetBackbone("resnet18")
    vb = jax.jit(bb.init)(jax.random.PRNGKey(0), img[:1])
    pb, sb = vb["params"], vb["batch_stats"]
    @jax.jit
    def f(p, img, gt):
        def loss(p):
            outs, mut = bb.apply({"params": p, "batch_stats": sb}, img, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o * o) for o in outs)
        return jax.grad(loss)(p)["conv0"]["kernel"]
    params = pb
    fn = f

out = fn(params, img, gt); np.asarray(out).ravel()[0]
t0=time.perf_counter()
for _ in range(8): out = fn(params, img, gt)
np.asarray(out).ravel()[0]
print(f"{which}: {(time.perf_counter()-t0)/8*1000:.1f}ms/step", flush=True)
