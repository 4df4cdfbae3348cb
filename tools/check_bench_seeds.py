#!/usr/bin/env python
"""Verify the committed bench compile-cache seeds match the CURRENT HLO.

Lowers (traces only — no compile) every bench entry point and compares its
lowered-HLO fingerprint against bench_cache/MANIFEST.json, and checks each
manifest cache-key file is present in bench_cache/. Exit 1 on any mismatch:
that is exactly the state that made the round-4 driver bench time out on a
cold ~30-min remote compile.

Run on the TPU host (the lowering is backend-specific) before shipping any
change that could touch the benched HLO; the fix is always
``python tools/refresh_bench_seeds.py`` on the TPU host, then commit
bench_cache/.

Usage: python tools/check_bench_seeds.py [--fast]
  --fast  check only the headline inference batch (skips tracing the
          train step; ~4x faster)
"""

import argparse
import os
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()

    from casapose_tpu.core.cache import (
        check_seed_fingerprint,
        load_seed_manifest,
        lowered_fingerprint,
        setup_compilation_cache,
    )

    setup_compilation_cache(REPO)
    manifest = load_seed_manifest(REPO)
    ok = True
    if not manifest:
        print("FAIL: bench_cache/MANIFEST.json missing — run tools/refresh_bench_seeds.py")
        return 1

    missing = [
        k for k in manifest.get("cache_keys", [])
        if not os.path.isfile(os.path.join(REPO, "bench_cache", k))
    ]
    if missing:
        ok = False
        print(f"FAIL: {len(missing)} manifest cache keys absent from bench_cache/: {missing[:3]}...")

    import jax

    if manifest.get("jax") != jax.__version__:
        ok = False
        print(f"FAIL: seeds built on jax {manifest.get('jax')}, running {jax.__version__}")

    import bench
    from __graft_entry__ import build_train_bench_case

    step, variables, make_imgs, kp_cam, _ = bench.build_inference_case()
    names = [n for n in manifest.get("entries", {}) if n.startswith("inference_b")]
    if args.fast:
        names = [n for n in names if n == f"inference_b{bench.BATCH}"] or names[:1]
    for name in sorted(names):
        b = manifest["entries"][name]["batch"]
        img = make_imgs(b, 1)[0]
        kp, cam = kp_cam(b)
        fp = lowered_fingerprint(step.lower(variables, img, kp, cam))
        good, msg = check_seed_fingerprint(manifest, name, fp)
        print(("ok:   " if good else "FAIL: ") + msg)
        ok = ok and good

    if not args.fast:
        for name, rec in manifest.get("entries", {}).items():
            if not name.startswith("train_b"):
                continue
            tstep, state, dev_batch, _hv = build_train_bench_case(
                B=rec["batch"], compute_dtype=rec["dtype"]
            )
            fp = lowered_fingerprint(tstep.lower(state, dev_batch, jax.random.PRNGKey(0)))
            good, msg = check_seed_fingerprint(manifest, name, fp)
            print(("ok:   " if good else "FAIL: ") + msg)
            ok = ok and good

    print("bench seeds: " + ("CURRENT" if ok else "STALE — run tools/refresh_bench_seeds.py"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
