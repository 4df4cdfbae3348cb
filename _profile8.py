import time, numpy as np, jax, jax.numpy as jnp
from scipy.spatial.transform import Rotation
K = jnp.asarray(np.array([[572.4,0,325.],[0,573.5,242.],[0,0,1]],np.float32))
rng = np.random.default_rng(0)
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
for iters in (1, 10):
    jax.block_until_ready(lm_refine_pallas(*args, iterations=iters))
    t0_=time.perf_counter()
    for _ in range(20): out=jax.block_until_ready(lm_refine_pallas(*args, iterations=iters))
    print(f"pallas LM iters={iters}: {(time.perf_counter()-t0_)/20*1000:.2f}ms", flush=True)

import casapose_tpu.pose.epnp as E
jf = jax.jit(lambda a,b: E.epnp_candidates(a,b,K))
(R1,t1),(R2,t2) = jax.block_until_ready(jf(jnp.asarray(pts2d), jnp.asarray(pts3d)))
def reproj(R,t):
    camx = np.einsum('bij,bnj->bni',np.asarray(R),pts3d)+np.asarray(t)[:,None]
    uvx = camx @ np.asarray(K).T
    return np.linalg.norm(uvx[...,:2]/uvx[...,2:]-pts2d,axis=-1).mean(1)
print("TPU epnp case1 err median/max:", np.median(reproj(R1,t1)), reproj(R1,t1).max(), flush=True)
print("TPU epnp case2 err median/max:", np.median(reproj(R2,t2)), reproj(R2,t2).max(), flush=True)
# subcomponent check: eigvec quality on TPU
ctrl = E._control_points(jnp.asarray(pts3d))
alphas = E._barycentric(jnp.asarray(pts3d), ctrl)
p2n = (jnp.asarray(pts2d) - jnp.asarray([325.,242.]))/jnp.asarray([572.4,573.5])
MtM = jax.jit(E._build_M)(alphas, p2n)
v1,v2 = jax.jit(E._smallest_eigvecs2)(MtM)
Mn = np.asarray(MtM).astype(np.float64)
w,V = np.linalg.eigh(Mn)
al = [abs(np.asarray(v1)[b] @ V[b][:,0]) for b in range(B)]
print("TPU eigvec alignment min/median:", min(al), float(np.median(al)), flush=True)
