import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
B,k = 32,9
pts3d = jnp.asarray(rng.uniform(-0.05,0.05,(B,k,3)).astype(np.float32))
pts2d = jnp.asarray(rng.uniform(100,400,(B,k,2)).astype(np.float32))
K = jnp.asarray(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32))
import casapose_tpu.pose.epnp as E

def timed(name, fn, *args, iters=20):
    jfn = jax.jit(fn)
    t0=time.perf_counter(); out = jax.block_until_ready(jfn(*args)); tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(iters): out=jax.block_until_ready(jfn(*args))
    print(f"{name}: compile {tc:.1f}s run {(time.perf_counter()-t0)/iters*1000:.2f}ms", flush=True)
    return out

timed("epnp_candidates", lambda a,b: E.epnp_candidates(a,b,K), pts2d, pts3d)
def refine_only(p2, p3):
    p0 = jnp.tile(jnp.asarray([0.,0,0,0,0,1.0]), (B,1))
    return E._refine(p0, p2, p3, K, 10)
timed("refine10", refine_only, pts2d, pts3d)
timed("solve_pnp", lambda a,b: E.solve_pnp(a,b,K), pts2d, pts3d)
# CC at full res
from casapose_tpu.ops.connected_components import largest_component_mask
fg = jnp.asarray(rng.uniform(size=(32,480,640)) < 0.05)
timed("largest_component", largest_component_mask, fg, iters=5)
