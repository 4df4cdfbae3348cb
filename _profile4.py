import time, sys
from functools import partial
import numpy as np, jax, jax.numpy as jnp

stage = sys.argv[1]
no_objects,k = 8,9
seg_dim = 1+no_objects
h,w,B = 480,640,4
rng = np.random.default_rng(0)

def timed(name, fn, *args, iters=3):
    t0=time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t_c = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(iters): out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name}: compile {t_c:.1f}s run {(time.perf_counter()-t0)/iters*1000:.2f}ms", flush=True)
    return out

seg = jnp.asarray(rng.normal(size=(B,h,w,seg_dim)).astype(np.float32))
dirs = jnp.asarray(rng.normal(size=(B,h,w,2*k)).astype(np.float32))
conf = jnp.asarray(rng.normal(size=(B,h,w,k)).astype(np.float32))

if stage == "voting":
    from casapose_tpu.ops.voting import ls_voting
    timed("ls_voting_nofilter", lambda s,d,c: ls_voting(s,d,c,num_points=k), seg, dirs, conf)
elif stage == "voting_filter":
    from casapose_tpu.ops.voting import ls_voting
    timed("ls_voting_filter", lambda s,d,c: ls_voting(s,d,c,num_points=k,filter_estimates=True), seg, dirs, conf)
elif stage == "cc":
    from casapose_tpu.ops.connected_components import largest_component_mask
    fg = jnp.asarray(rng.uniform(size=(B*no_objects,h,w)) < 0.05)
    timed("largest_component", largest_component_mask, fg)
elif stage == "pnp":
    from casapose_tpu.pose.evaluation import poses_pnp
    coords = jnp.asarray(rng.uniform(0,400,(B,no_objects,k,2)).astype(np.float32))
    kp3 = jnp.asarray(rng.uniform(-0.05,0.05,(B,no_objects,1,k,3)).astype(np.float32))
    cam = jnp.asarray(np.tile(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32),(B,1,1)))
    timed("poses_pnp", lambda c,s: poses_pnp(c,s,kp3,cam,no_objects), coords, seg)
