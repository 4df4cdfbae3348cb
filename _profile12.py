import time, sys, numpy as np, jax, jax.numpy as jnp
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from casapose_tpu.models.registry import get_model
from casapose_tpu.ops.voting import ls_voting
from casapose_tpu.pose.evaluation import poses_pnp
no_objects,k = 8,9; seg_dim=9; h,w=480,640; B=4
model = get_model("casapose_c_gcu5", ver_dim=27, seg_dim=seg_dim)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B,h,w,3)).astype(np.float32))
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img[:1])
kp3 = jnp.asarray(rng.uniform(-0.05,0.05,(B,no_objects,1,k,3)).astype(np.float32))
cam = jnp.asarray(np.tile(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32),(B,1,1)))
stage = sys.argv[1]

@jax.jit
def s_model(v, x):
    return jnp.sum(model.apply(v, x, train=False))
@jax.jit
def s_vote(v, x):
    out = model.apply(v,x,train=False)
    seg=out[...,:seg_dim]; dirs=out[...,seg_dim:seg_dim+2*k]; conf=out[...,seg_dim+2*k:]
    return jnp.sum(ls_voting(seg,dirs,conf,num_points=k))
@jax.jit
def s_filt(v, x):
    out = model.apply(v,x,train=False)
    seg=out[...,:seg_dim]; dirs=out[...,seg_dim:seg_dim+2*k]; conf=out[...,seg_dim+2*k:]
    return jnp.sum(ls_voting(seg,dirs,conf,num_points=k,filter_estimates=True))
@jax.jit
def s_full(v, x):
    out = model.apply(v,x,train=False)
    seg=out[...,:seg_dim]; dirs=out[...,seg_dim:seg_dim+2*k]; conf=out[...,seg_dim+2*k:]
    coords = ls_voting(seg,dirs,conf,num_points=k,filter_estimates=True)
    return jnp.sum(poses_pnp(coords, seg, kp3, cam, no_objects))
fn = {"model": s_model, "vote": s_vote, "filt": s_filt, "full": s_full}[stage]
np.asarray(fn(variables, img))
t0=time.perf_counter()
outs=[fn(variables,img) for _ in range(30)]
np.asarray(outs[-1]); [o.block_until_ready() for o in outs]
dt=(time.perf_counter()-t0)/30
print(f"{stage}: {dt*1000:.2f}ms/batch -> {B/dt:.1f} img/s", flush=True)
