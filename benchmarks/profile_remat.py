#!/usr/bin/env python
"""Remat (jax.checkpoint) train-step experiment: time and peak-HBM scan.

The train step is bandwidth-bound (DESIGN.md §7); rematerializing the
network forward in the backward pass trades one extra forward of compute
for not storing conv activations between fwd and bwd. That can cut peak
HBM enough to admit larger per-chip batches — which matters because
throughput scales sub-linearly but positively with batch (48.5 img/s @8
-> 60 @32). This script measures ms/step for remat on/off across a batch
scan (compile-or-OOM at each size is the memory signal; see live_bytes).

Usage: CASAPOSE_REMAT_BATCHES=8,32,64 python benchmarks/profile_remat.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def live_bytes():
    """Currently-allocated device bytes (NOT peak: ``peak_bytes_in_use`` is
    process-cumulative, so a per-config 'peak' column would just repeat the
    largest earlier config; the axon tunnel also reports no stats at all).
    Compile-or-OOM at each batch size is the decisive memory signal here."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0)
    except Exception:
        return 0


def main():
    import jax

    from casapose_tpu.core.cache import setup_compilation_cache

    setup_compilation_cache()

    from __graft_entry__ import build_train_bench_case

    dtype = os.environ.get("CASAPOSE_TRAIN_DTYPE", "bfloat16")
    rngk = jax.random.PRNGKey(0)
    # The train step donates its state; build_train_bench_case re-shards
    # fresh host copies per config (host_vars threaded through to skip
    # re-initializing the model every round).
    host_vars = None

    batches = [int(b) for b in os.environ.get("CASAPOSE_REMAT_BATCHES", "8,32,64").split(",")]
    for B in batches:
        for remat in (False, True):
            step, state, dev_batch, host_vars = build_train_bench_case(
                B=B, compute_dtype=dtype, remat=remat, host_variables=host_vars
            )
            try:
                state, losses = step(state, dev_batch, rngk)
                np.asarray(losses)
            except Exception as e:  # noqa: BLE001 — OOM reporting is the point
                print(f"B={B:3d} remat={int(remat)}  FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            for _ in range(10):
                state, losses = step(state, dev_batch, rngk)
            np.asarray(losses)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    state, losses = step(state, dev_batch, rngk)
                np.asarray(losses)
                best = min(best, (time.perf_counter() - t0) / 10)
            print(
                f"B={B:3d} remat={int(remat)}  {best*1e3:7.1f} ms/step  {B/best:6.1f} img/s  "
                f"live {live_bytes()/2**30:.2f} GiB",
                flush=True,
            )
            del state, step, dev_batch


if __name__ == "__main__":
    main()
