import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
from scipy.spatial.transform import Rotation
K = jnp.asarray(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32))
B,Nk = 64,9
pts3d = rng.uniform(-0.06,0.06,(B,Nk,3)).astype(np.float32)
R_gt = Rotation.random(B, random_state=1).as_matrix().astype(np.float32)
t_gt = np.stack([rng.uniform(-.1,.1,B),rng.uniform(-.1,.1,B),rng.uniform(.5,1.2,B)],1).astype(np.float32)
cam = np.einsum('bij,bnj->bni',R_gt,pts3d)+t_gt[:,None]
uv = cam @ np.asarray(K).T; pts2d=(uv[...,:2]/uv[...,2:]).astype(np.float32)

from casapose_tpu.ops.pnp_kernel import lm_refine_pallas
R0 = Rotation.from_rotvec(Rotation.from_matrix(R_gt).as_rotvec()+rng.normal(scale=0.2,size=(B,3))).as_matrix().astype(np.float32)
t0 = (t_gt + rng.normal(scale=0.05,size=(B,3))).astype(np.float32)
args = (jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts2d), jnp.asarray(pts3d), K)
t0_=time.perf_counter(); out = jax.block_until_ready(lm_refine_pallas(*args, iterations=10)); print(f"pallas LM compile {time.perf_counter()-t0_:.1f}s", flush=True)
t0_=time.perf_counter()
for _ in range(20): out=jax.block_until_ready(lm_refine_pallas(*args, iterations=10))
print(f"pallas LM run {(time.perf_counter()-t0_)/20*1000:.2f}ms err_max={float(jnp.max(out[2])):.2e}", flush=True)

from casapose_tpu.pose.epnp import solve_pnp
jfn = jax.jit(lambda a,b: solve_pnp(a,b,K))
t0_=time.perf_counter(); p=jax.block_until_ready(jfn(jnp.asarray(pts2d), jnp.asarray(pts3d))); print(f"solve_pnp compile {time.perf_counter()-t0_:.1f}s", flush=True)
t0_=time.perf_counter()
for _ in range(20): p=jax.block_until_ready(jfn(jnp.asarray(pts2d), jnp.asarray(pts3d)))
print(f"solve_pnp run {(time.perf_counter()-t0_)/20*1000:.2f}ms", flush=True)
print("t err:", float(np.abs(np.asarray(p)[:,3:6]-t_gt).max()))
