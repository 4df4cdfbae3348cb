import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp

def timed(name, fn, *args):
    t0=time.perf_counter()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t_compile = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(5):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    t_run=(time.perf_counter()-t0)/5
    print(f"{name}: compile {t_compile:.1f}s run {t_run*1000:.2f}ms", flush=True)
    return out

no_objects,k = 8,9
seg_dim = 1+no_objects
h,w = 480,640
B = 4
rng = np.random.default_rng(0)

from casapose_tpu.models.registry import get_model
model = get_model("casapose_c_gcu5", ver_dim=3*k, seg_dim=seg_dim)
img = jnp.asarray(rng.normal(size=(B,h,w,3)).astype(np.float32))
variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img[:1])
out = timed("model_fwd_b4", lambda v,x: model.apply(v,x,train=False), variables, img)

seg = out[..., :seg_dim]; dirs = out[..., seg_dim:seg_dim+2*k]; conf = out[..., seg_dim+2*k:]
from casapose_tpu.ops.voting import ls_voting
coords = timed("ls_voting_nofilter", lambda s,d,c: ls_voting(s,d,c,num_points=k), seg, dirs, conf)
coords2 = timed("ls_voting_filter", lambda s,d,c: ls_voting(s,d,c,num_points=k,filter_estimates=True), seg, dirs, conf)

from casapose_tpu.ops.connected_components import connected_components_labels, largest_component_mask
fg = jnp.asarray(rng.uniform(size=(B*no_objects,h,w)) < 0.05)
timed("cc_labels", connected_components_labels, fg)
timed("largest_component", largest_component_mask, fg)

from casapose_tpu.pose.evaluation import poses_pnp
kp3 = jnp.asarray(rng.uniform(-0.05,0.05,(B,no_objects,1,k,3)).astype(np.float32))
cam = jnp.asarray(np.tile(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32),(B,1,1)))
timed("poses_pnp", lambda c,s: poses_pnp(c,s,kp3,cam,no_objects), coords, seg)
