import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(64,18,12)).astype(np.float32))

@jax.jit
def small(a):
    return jnp.einsum("bri,brj->bij", a, a)

# per-call sync
jax.block_until_ready(small(x))
t0=time.perf_counter()
for _ in range(20): jax.block_until_ready(small(x))
print(f"small sync each: {(time.perf_counter()-t0)/20*1000:.2f}ms", flush=True)

# pipelined: chain 20 calls, sync once
t0=time.perf_counter()
y = x
for _ in range(20): y = small(y[:, :18, :12].reshape(64,18,12)) if False else small(x)
jax.block_until_ready(y)
print(f"small async pipelined (indep): {(time.perf_counter()-t0)/20*1000:.2f}ms", flush=True)

# chained dependency
@jax.jit
def small2(a):
    s = jnp.einsum("bri,brj->bij", a, a)
    return a + 1e-9 * jnp.sum(s)
t0=time.perf_counter()
y = x
for _ in range(20): y = small2(y)
jax.block_until_ready(y)
print(f"small async chained: {(time.perf_counter()-t0)/20*1000:.2f}ms", flush=True)

# fetch scalar each call (true sync)
@jax.jit
def small3(a):
    return jnp.sum(jnp.einsum("bri,brj->bij", a, a))
small3(x)
t0=time.perf_counter()
for _ in range(20): float(small3(x))
print(f"small fetch scalar each: {(time.perf_counter()-t0)/20*1000:.2f}ms", flush=True)

# big conv for comparison with fetch
from casapose_tpu.models.registry import get_model
from functools import partial
model = get_model("casapose_c_gcu5", ver_dim=27, seg_dim=9)
img = jnp.zeros((1,240,320,3), jnp.float32)
v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img)
fwd = jax.jit(lambda v,x: jnp.sum(model.apply(v,x,train=False)))
float(fwd(v,img))
t0=time.perf_counter()
for _ in range(10): float(fwd(v,img))
print(f"model fwd fetch scalar each: {(time.perf_counter()-t0)/10*1000:.2f}ms", flush=True)
t0=time.perf_counter()
ys=[fwd(v,img) for _ in range(10)]
jax.block_until_ready(ys)
print(f"model fwd pipelined: {(time.perf_counter()-t0)/10*1000:.2f}ms", flush=True)
