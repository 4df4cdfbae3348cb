"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding logic is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4); numerical kernels
are validated on CPU and are platform-agnostic by construction.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's experimental TPU plugin ignores JAX_PLATFORMS; the
# config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the full train/eval steps (minutes each on this host), not
# by the numerics under test. Warm re-runs skip straight to execution.
# Keyed by XLA version + flags, so stale entries are just misses.
_cc_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "jax_test_cache")
os.makedirs(_cc_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cc_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
