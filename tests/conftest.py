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
# One shared cache (.jax_cache) for the suite AND the CLI drivers the e2e
# tests invoke (run_training/run_evaluation call setup_compilation_cache
# themselves — pointing at the same dir keeps it coherent), seeded from
# the committed suite_cache_seed/ so fresh checkouts start warm. Keyed by
# XLA version + flags, so stale entries are just misses.
import sys as _sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_sys.path.insert(0, _repo_root)
from casapose_tpu.core.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache(_repo_root)
