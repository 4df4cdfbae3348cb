#!/usr/bin/env python
"""Batched-eval harness throughput: --batchsize_test N vs the reference's batch-1.

The reference accuracy harness is structurally batch-1 (reference
test_casapose.py:155-184 — one image per step, a host sync per image);
our eval step is batched end to end (casapose_tpu/eval.py), with batch-1
metric equality pinned by tests/test_batched_eval.py. This script measures
what the batching is worth: it builds a synthetic NDDS scene, runs the
REAL ``run_evaluation`` harness (loader -> forward -> voting -> PnP ->
ADD(-S)/2D metrics -> CSV) at several ``--batchsize_test`` values, and
prints harness img/s from the harness's own per-batch step timer.

Usage: CASAPOSE_EVAL_BATCHES=1,8,16 python benchmarks/profile_eval_batched.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def main():
    from synthetic_scene import make_meshes, make_scene

    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    n_images = int(os.environ.get("CASAPOSE_EVAL_IMAGES", "96"))
    batches = [int(b) for b in os.environ.get("CASAPOSE_EVAL_BATCHES", "1,8,16").split(",")]

    root = tempfile.mkdtemp(prefix="eval_bench_")
    try:
        mesh_root = os.path.join(root, "models")
        data_root = os.path.join(root, "data")
        make_meshes(mesh_root)
        make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=n_images)

        # CASAPOSE_EVAL_CACHE=1: run each size twice with --cache_records 1.
        # The warm pass shows the harness rate once decode/warp/GT-parse
        # leave the per-pass path — i.e. what a multi-core TPU-VM host gets
        # on pass 1, measured on this 1-core host (VERDICT r4 item 5).
        use_cache = os.environ.get("CASAPOSE_EVAL_CACHE") == "1"
        for batch in batches:
            passes = 2 if use_cache else 1
            for p in range(passes):
                outf = os.path.join(root, f"out_b{batch}")
                evalf = os.path.join(root, f"eval_b{batch}_p{p}")
                flags = [
                    "--data", data_root + "_none", "--datatest", data_root,
                    "--datameshes", mesh_root, "--object", "obj_000001,obj_000002",
                    "--modelname", "casapose_c_gcu5", "--estimate_confidence", "1",
                    "--estimate_coords", "1", "--no_points", "9",
                    "--imagesize_test", "480", "640",
                    "--train_vectors_with_ground_truth", "0",
                    "--outf", outf, "--evalf", evalf, "--min_object_size_test", "1",
                    "--workers", "2", "--prefetch", "4", "--manualseed", "3",
                    "--batchsize_test", str(batch),
                ]
                if use_cache:
                    flags += ["--cache_records", "1"]
                # CASAPOSE_EVAL_SERVING=1: the deployment configuration —
                # bf16 convs + TPU-default matmul precision, the same
                # precision policy as the headline bench. The default
                # (f32 + highest) is the PARITY configuration, matching the
                # TF reference to 4-5 decimals (tests/test_reference_e2e.py)
                # at a measured throughput cost.
                if os.environ.get("CASAPOSE_EVAL_SERVING") == "1":
                    flags += ["--compute_dtype", "bfloat16", "--matmul_precision", "default"]
                opt = parse_config(flags)
                res = run_evaluation(opt)
                mt = res["mean_time"]  # per-batch step time, warmup batches skipped
                import numpy as np

                wall_rate = res["total_images"] / max(res["wall_seconds"], 1e-9)
                shares = " ".join(f"{k}={v:.1f}s" for k, v in res["phase_seconds"].items())
                label = f" pass{p+1}(cache)" if use_cache else ""
                print(
                    f"batchsize_test={batch:3d}{label}  {mt*1e3:7.1f} ms/batch (step)  "
                    f"{batch/mt:6.1f} img/s (step)  {wall_rate:6.1f} img/s end-to-end  "
                    f"{res.get('steady_img_per_sec', 0.0):6.1f} img/s steady  [{shares}]  "
                    f"(3d_valid_mean={float(np.mean(res['err_3d'])):.4f})",
                    flush=True,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
