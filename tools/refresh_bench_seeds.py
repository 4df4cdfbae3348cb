#!/usr/bin/env python
"""Refresh the committed bench compile-cache seeds (bench_cache/) for the
CURRENT benched HLO, and write the staleness manifest.

Round 4's driver bench timed out (BENCH_r04: rc 124) because the committed
seeds were compiled for an older HLO: the round changed the voting
contraction and the default bench batch without re-warming, every cache key
missed, and the driver paid a ~30-min cold remote compile it has no budget
for. This tool makes that failure impossible to repeat silently:

1. compiles every bench entry point (inference at each scan batch size +
   the train step) against the live persistent cache — warm entries cost
   seconds, changed entries pay their one-time compile HERE, not in the
   driver;
2. records exactly which persistent-cache keys those compiles touch (by
   hooking jax's compilation-cache get/put), and rewrites bench_cache/ to
   be precisely that file set;
3. writes bench_cache/MANIFEST.json with each entry point's lowered-HLO
   fingerprint. bench.py and tools/check_bench_seeds.py compare the
   current lowering against it and warn/fail loudly when the seeds are
   stale.

Run on the TPU host after ANY change that could affect the benched HLO
(model/ops/voting/train-step code, bench batch sizes, dtype policy,
jax/jaxlib upgrades), then commit bench_cache/.

Usage: python tools/refresh_bench_seeds.py [--scan 16,32,64] [--no-train]
"""

import argparse
import json
import os
import shutil
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)


def _log(msg):
    print(f"[seeds {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    # B64 is excluded by default: its cold compile exceeds what the remote
    # compile service will serve (observed: 3889s then "Unexpected EOF"),
    # and it OOMs single-chip at 480x640 anyway.
    ap.add_argument("--scan", default="16,32", help="inference batch sizes to warm")
    ap.add_argument("--no-train", action="store_true", help="skip the train-step entry")
    ap.add_argument(
        "--train-batch", type=int, default=int(os.environ.get("CASAPOSE_TRAIN_BATCH", "32"))
    )
    ap.add_argument("--train-dtype", default=os.environ.get("CASAPOSE_TRAIN_DTYPE", "bfloat16"))
    args = ap.parse_args()
    sizes = [int(s) for s in args.scan.split(",") if s]

    from casapose_tpu.core.cache import lowered_fingerprint, setup_compilation_cache

    cache_dir = setup_compilation_cache(REPO)

    import jax
    from jax._src import compilation_cache as cc

    # Record every persistent-cache key the bench entry points touch.
    touched = set()
    orig_get, orig_put = cc.get_executable_and_time, cc.put_executable_and_time

    def rec_get(cache_key, *a, **kw):
        touched.add(cache_key)
        return orig_get(cache_key, *a, **kw)

    def rec_put(cache_key, *a, **kw):
        touched.add(cache_key)
        return orig_put(cache_key, *a, **kw)

    cc.get_executable_and_time, cc.put_executable_and_time = rec_get, rec_put

    entries = {}

    import bench

    _log("building inference case (model init)...")
    step, variables, make_imgs, kp_cam, _ = bench.build_inference_case()
    for b in sizes:
        img = make_imgs(b, 1)[0]
        kp, cam = kp_cam(b)
        t0 = time.time()
        lowered = step.lower(variables, img, kp, cam)
        fp = lowered_fingerprint(lowered)
        _log(f"inference B{b}: fingerprint {fp}, compiling...")
        try:
            lowered.compile()
            _log(f"inference B{b} compiled in {time.time() - t0:.0f}s")
            entries[f"inference_b{b}"] = {"fingerprint": fp, "batch": b}
        except Exception as e:  # e.g. B64 remote-compile limit: record nothing
            _log(f"inference B{b} FAILED after {time.time() - t0:.0f}s: {str(e)[:200]}")

    if not args.no_train:
        from __graft_entry__ import build_train_bench_case

        _log(f"building train case B{args.train_batch} {args.train_dtype}...")
        tstep, state, dev_batch, _hv = build_train_bench_case(
            B=args.train_batch, compute_dtype=args.train_dtype
        )
        t0 = time.time()
        lowered = tstep.lower(state, dev_batch, jax.random.PRNGKey(0))
        fp = lowered_fingerprint(lowered)
        name = f"train_b{args.train_batch}_{args.train_dtype}"
        _log(f"{name}: fingerprint {fp}, compiling...")
        try:
            lowered.compile()
            _log(f"{name} compiled in {time.time() - t0:.0f}s")
            entries[name] = {
                "fingerprint": fp, "batch": args.train_batch, "dtype": args.train_dtype,
            }
        except Exception as e:
            _log(f"{name} FAILED after {time.time() - t0:.0f}s: {str(e)[:200]}")

    cc.get_executable_and_time, cc.put_executable_and_time = orig_get, orig_put

    # bench_cache/ := exactly the touched keys that exist as live-cache files
    # (keys under jax_persistent_cache_min_compile_time never hit disk).
    # A touched key is "{module_name}-{hash}" (jax._src.cache_key.get), but
    # the LRU cache backend stores it as "{key}-cache"
    # (jax._src.lru_cache._CACHE_SUFFIX) — the first round-5 refresh looked
    # up the bare key, matched nothing, and shipped an EMPTY seed dir after
    # two hours of compiling. Try both names.
    bench_dir = os.path.join(REPO, "bench_cache")
    os.makedirs(bench_dir, exist_ok=True)
    keep, total = set(), 0
    for key in sorted(touched):
        for fname in (key + "-cache", key):
            src = os.path.join(cache_dir, fname)
            if os.path.isfile(src):
                break
        else:
            continue
        keep.add(fname)
        total += os.path.getsize(src)
        dst = os.path.join(bench_dir, fname)
        if not os.path.exists(dst) or os.path.getsize(dst) != os.path.getsize(src):
            shutil.copyfile(src, dst)
    removed = 0
    for f in os.listdir(bench_dir):
        if f != "MANIFEST.json" and f not in keep:
            os.remove(os.path.join(bench_dir, f))
            removed += 1

    manifest = {
        "jax": jax.__version__,
        "device_kind": jax.devices()[0].device_kind,
        "refreshed": time.strftime("%Y-%m-%d %H:%M:%S"),
        "entries": entries,
        "cache_keys": sorted(keep),
    }
    with open(os.path.join(bench_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    _log(
        f"bench_cache/: {len(keep)} entries, {total/1e6:.1f} MB "
        f"({removed} stale removed); manifest: {len(entries)} entry points"
    )
    if len(entries) < len(sizes) + (0 if args.no_train else 1):
        _log("WARNING: some entry points failed to compile — manifest is partial")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
