"""Persistent XLA compilation cache setup (shared by bench.py and
__graft_entry__).

First compiles of the fused inference step cost minutes over a TPU tunnel;
``bench_cache/`` ships pre-built binaries for the default configurations so
a fresh checkout skips the cold compile (stale entries are just misses).
"""

import os
import shutil


def setup_compilation_cache(repo_root=None):
    import jax

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cache_dir = os.path.join(repo_root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    seed_dir = os.path.join(repo_root, "bench_cache")
    if os.path.isdir(seed_dir):
        for f in os.listdir(seed_dir):
            dst = os.path.join(cache_dir, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(seed_dir, f), dst)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
