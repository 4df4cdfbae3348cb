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
P2, P3 = jnp.asarray(pts2d), jnp.asarray(pts3d)
import casapose_tpu.pose.epnp as E

def timed(name, jfn, *args, iters=20):
    out = jax.block_until_ready(jfn(*args))
    t0=time.perf_counter()
    for _ in range(iters): out=jax.block_until_ready(jfn(*args))
    print(f"{name}: {(time.perf_counter()-t0)/iters*1000:.2f}ms", flush=True)
    return out

with jax.default_matmul_precision("float32"):
    ctrl = E._control_points(P3)
    alphas = E._barycentric(P3, ctrl)
    p2n = (P2 - jnp.asarray([325.,242.]))/jnp.asarray([572.4,573.5])
    MtM = jax.jit(E._build_M)(alphas, p2n)

timed("build_M", jax.jit(E._build_M), alphas, p2n)
timed("eig_ns", jax.jit(E._smallest_eigvecs2), MtM)

# Cholesky-based inverse-iteration eigvec (candidate replacement)
def chol_eig2(A, iters=6):
    n = A.shape[-1]
    tr = jnp.trace(A, axis1=1, axis2=2)[:, None]
    An = A + (1e-6*tr[...,None] + 1e-30)*jnp.eye(n, dtype=A.dtype)[None]
    # factor once (unrolled, batched over B)
    L = [[None]*n for _ in range(n)]
    for i in range(n):
        for j in range(i+1):
            s = An[:, i, j]
            for k in range(j): s = s - L[i][k]*L[j][k]
            L[i][j] = jnp.sqrt(jnp.maximum(s,1e-30)) if i==j else s/L[j][j]
    def solve(b):  # b: list of n [B]
        y=[None]*n
        for i in range(n):
            s=b[i]
            for k in range(i): s = s - L[i][k]*y[k]
            y[i]=s/L[i][i]
        x=[None]*n
        for i in reversed(range(n)):
            s=y[i]
            for k in range(i+1,n): s = s - L[k][i]*x[k]
            x[i]=s/L[i][i]
        return x
    v1=[jnp.full((A.shape[0],), 1.0+0.1*i) for i in range(n)]
    v2=[jnp.full((A.shape[0],), 2.0-0.2*i) for i in range(n)]
    for _ in range(iters):
        v1=solve(v1); v2=solve(v2)
        n1=jnp.sqrt(sum(v*v for v in v1)); v1=[v/n1 for v in v1]
        d=sum(a*b for a,b in zip(v1,v2)); v2=[b-d*a for a,b in zip(v1,v2)]
        n2=jnp.sqrt(jnp.maximum(sum(v*v for v in v2),1e-30)); v2=[v/n2 for v in v2]
    V1=jnp.stack(v1,-1); V2=jnp.stack(v2,-1)
    # Rayleigh-Ritz
    T11=jnp.einsum('bi,bij,bj->b',V1,A,V1); T22=jnp.einsum('bi,bij,bj->b',V2,A,V2); T12=jnp.einsum('bi,bij,bj->b',V1,A,V2)
    th=0.5*jnp.arctan2(2*T12, T11-T22+1e-30)
    c,s=jnp.cos(th),jnp.sin(th)
    r1=c[:,None]*V1+s[:,None]*V2; r2=-s[:,None]*V1+c[:,None]*V2
    e1=jnp.einsum('bi,bij,bj->b',r1,A,r1); e2=jnp.einsum('bi,bij,bj->b',r2,A,r2)
    fs=(e1<=e2)[:,None]
    return jnp.where(fs,r1,r2), jnp.where(fs,r2,r1)

jce = jax.jit(chol_eig2)
v1c, v2c = timed("eig_chol", jce, MtM)
w,V = np.linalg.eigh(np.asarray(MtM).astype(np.float64))
al=[abs(np.asarray(v1c)[b]@V[b][:,0]) for b in range(B)]
print("chol eig alignment min/median:", min(al), float(np.median(al)), flush=True)

def refine_xla(p2, p3):
    p0 = jnp.tile(jnp.asarray([0.,0,0,0,0,1.0]), (B,1))
    return E._refine(p0, p2, p3, K, 10)
timed("refine_xla_10", jax.jit(refine_xla), P2, P3)
timed("procrustes", jax.jit(E._procrustes), P3, P3+0.01)
