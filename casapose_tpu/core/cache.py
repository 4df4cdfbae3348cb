"""Persistent XLA compilation cache setup (shared by bench.py,
__graft_entry__, the CLI drivers, and the test suite).

First compiles of the fused inference step cost minutes over a TPU tunnel
(and the big train/eval steps cost minutes each on XLA:CPU), so the live
cache ``.jax_cache/`` is seeded from committed seed directories:

  * ``bench_cache/``      — TPU binaries for the bench/driver entry points;
  * ``suite_cache_seed/`` — CPU binaries + TF-oracle fixtures for the test
    suite (populated by ``tools/update_cache_seeds.py``).

Cache keys include the jaxlib/XLA version, backend, and compile flags, so
stale or foreign entries are just misses — seeding can never change
results, only skip recompiles.
"""

import os
import shutil

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_from(seed_dir, cache_dir):
    """Copy missing entries of ``seed_dir`` into the live ``cache_dir``."""
    if not os.path.isdir(seed_dir):
        return
    os.makedirs(cache_dir, exist_ok=True)
    for f in os.listdir(seed_dir):
        src = os.path.join(seed_dir, f)
        dst = os.path.join(cache_dir, f)
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)


def setup_compilation_cache(repo_root=None):
    import jax

    if repo_root is None:
        repo_root = _REPO_ROOT
    cache_dir = os.path.join(repo_root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    seed_from(os.path.join(repo_root, "bench_cache"), cache_dir)
    seed_from(os.path.join(repo_root, "suite_cache_seed", "xla"), cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
