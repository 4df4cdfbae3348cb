import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
rng = np.random.default_rng(0)
which = sys.argv[1]
if which == "cc":
    from casapose_tpu.ops.connected_components import largest_component_mask
    fg = jnp.asarray(rng.uniform(size=(32,480,640)) < 0.05)
    f = jax.jit(largest_component_mask)
    t0=time.perf_counter(); out=f(fg); np.asarray(out[0,0,0]); print(f"cc compile+1run {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    outs=[f(fg) for _ in range(5)]
    np.asarray(outs[-1][0,0,0]); [o.block_until_ready() for o in outs]
    print(f"cc pipelined {((time.perf_counter()-t0)/5)*1000:.1f}ms", flush=True)
elif which == "labels":
    from casapose_tpu.ops.connected_components import connected_components_labels
    fg = jnp.asarray(rng.uniform(size=(32,480,640)) < 0.05)
    f = jax.jit(connected_components_labels)
    t0=time.perf_counter(); out=f(fg); np.asarray(out[0,0,0]); print(f"labels compile+1run {time.perf_counter()-t0:.1f}s", flush=True)
