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

import hashlib
import json
import os
import shutil

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST_NAME = "MANIFEST.json"


def lowered_fingerprint(lowered):
    """Stable fingerprint of a ``jax.stages.Lowered``: sha256 of the lowered
    StableHLO text. Changes whenever the traced program (code, shapes,
    dtypes, flags that affect lowering) changes — exactly the situations
    that invalidate a committed compile-cache seed."""
    return hashlib.sha256(lowered.as_text().encode()).hexdigest()[:16]


def seed_manifest_path(repo_root=None):
    return os.path.join(repo_root or _REPO_ROOT, "bench_cache", MANIFEST_NAME)


def load_seed_manifest(repo_root=None):
    """The committed bench-seed manifest ({} when absent): per bench entry
    point, the lowered-HLO fingerprint its cached binaries were built for.
    Written by tools/refresh_bench_seeds.py; checked by bench.py and
    tools/check_bench_seeds.py so a stale seed fails loudly BEFORE the
    driver pays a ~30-min cold remote compile (the round-4 bench timeout)."""
    path = seed_manifest_path(repo_root)
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def check_seed_fingerprint(manifest, entry, fingerprint):
    """(ok, message) for one bench entry point against the manifest."""
    if not manifest:
        return False, "bench_cache/MANIFEST.json missing — seeds unverifiable (run tools/refresh_bench_seeds.py)"
    rec = manifest.get("entries", {}).get(entry)
    if rec is None:
        return False, f"no manifest entry for {entry!r} — run tools/refresh_bench_seeds.py"
    if rec.get("fingerprint") != fingerprint:
        return False, (
            f"STALE seed for {entry!r}: current lowered-HLO fingerprint {fingerprint} != "
            f"manifest {rec.get('fingerprint')} (HLO changed since seeds were refreshed; "
            "expect a cold compile — run tools/refresh_bench_seeds.py)"
        )
    return True, f"{entry}: seed fingerprint current ({fingerprint})"


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
    # Pallas kernels serialize their MLIR body (locations included) into the
    # tpu_custom_call backend_config, and with jax's default
    # full-traceback locations that body embeds the CALLSITE STACK of the
    # trace — so the same program lowered from bench.py, from
    # tools/refresh_bench_seeds.py, or after an unrelated helper jit got a
    # different HLO byte-string and therefore a DIFFERENT persistent-cache
    # key (the outer module is strip-debuginfo'd for the key, the inner
    # payload is an opaque constant and is not). Seeds compiled by the
    # refresh tool could then never be hit by the driver's bench run.
    # Single-user-frame locations keep only the op's own frame in the
    # kernel source file, which is callsite-independent; verified to make
    # the lowering byte-identical across entry points and trace orders.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return cache_dir
