"""End-to-end cross-framework parity: BOTH eval harnesses on one scene.

The oracle ``eval`` command runs the REFERENCE ``test_casapose.py`` (the
actual script under runpy with dependency shims) on a deterministic
synthetic NDDS scene with reference-generated h5 weights, persisting the
scene + h5 + CSVs + summary log as a cached fixture. This test runs OUR
``run_evaluation`` on the same files and compares per-image losses and
summary metrics.

Two configurations (VERDICT r2 items 2b + 7):
  * ``ls``     — casapose_c_gcu5, estimate_coords=1: LS voting + PnP path;
  * ``ransac`` — pvnet, estimate_coords=0: separated vector fields +
    RANSAC hypothesis voting path (reference pose_evaluation.py:11-101).

What this pins down: dataset scan + GT JSON parse + batch assembly + GT
vector fields + forward pass + voting + loss computation + summary
aggregation, through the real CLIs of both frameworks.
"""

import csv
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
from oracle_cache import ensure_fixtures, oracle_skip  # noqa: E402

pytestmark = pytest.mark.slow

VARIANTS = {
    "ls": {"argv": ["eval"], "model": "casapose_c_gcu5", "coords": 1, "confidence": 1},
    "ransac": {
        "argv": ["eval", "--model", "pvnet", "--coords", "0", "--confidence", "0"],
        "model": "pvnet",
        "coords": 0,
        "confidence": 0,
    },
}


def _fixture(variant):
    try:
        return ensure_fixtures([VARIANTS[variant]["argv"]], timeout=1500)[0]
    except RuntimeError as e:
        oracle_skip(e)


def _our_flags(fixture, outf, evalf, v):
    return [
        "--data", os.path.join(fixture, "data") + "_none",  # != datatest: no split
        "--datatest", os.path.join(fixture, "data"),
        "--datameshes", os.path.join(fixture, "models"),
        "--object", "obj_000001,obj_000002", "--modelname", v["model"],
        "--estimate_confidence", str(v["confidence"]), "--estimate_coords", str(v["coords"]),
        "--no_points", "9",
        "--imagesize_test", "240", "320", "--train_vectors_with_ground_truth", "0",
        "--load_h5_weights", "1", "--load_h5_filename", os.path.join(fixture, "weights"),
        "--outf", outf, "--evalf", evalf, "--min_object_size_test", "1",
        "--workers", "1", "--prefetch", "1", "--manualseed", "3",
    ]


def _read_losses(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return np.array([[float(r["mask_loss"]), float(r["vertex_loss"]), float(r["proxy_loss"]),
                      float(r["kp_loss"])] for r in rows])


@pytest.mark.parametrize("variant", list(VARIANTS.keys()))
def test_eval_harness_parity(variant, tmp_path):
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    fixture = _fixture(variant)
    v = VARIANTS[variant]
    ref = _read_losses(os.path.join(fixture, "ref_eval", "loss_test_eval.csv"))

    our_out = str(tmp_path / "our_out")
    our_eval = str(tmp_path / "our_eval")
    opt = parse_config(_our_flags(fixture, our_out, our_eval, v))
    result = run_evaluation(opt)

    ours = _read_losses(os.path.join(our_eval, "loss_test_eval.csv"))
    assert ref.shape == ours.shape, f"batch count differs: {ref.shape} vs {ours.shape}"

    # mask / vertex / proxy have no voting/PnP in the loss path: the
    # measured cross-framework agreement is ~1e-4 relative (f32 forward
    # accumulation); band at 1e-3 = 10x cushion, 10x tighter than the old
    # 1% bound so slow drift gets caught (VERDICT r2 item 7).
    for j, name, tol in ((0, "mask", 1e-3), (1, "vertex", 1e-3), (2, "proxy", 1e-3)):
        rel = np.abs(ours[:, j] - ref[:, j]) / np.maximum(np.abs(ref[:, j]), 1e-6)
        assert rel.max() < tol, f"{name} loss diverges: ours {ours[:, j]} vs ref {ref[:, j]}"

    if v["coords"]:
        # keypoint loss embeds pose estimation with estimate_poses=True
        # (reference: host cv2 PnP; ours: on-device EPnP+LM). On this
        # random-weight scene the voted coordinates are garbage, so the
        # two solvers legitimately land in different clamped local minima;
        # measured divergence ~10%, band 15%. The PnP-FREE keypoint loss
        # (training mode) is pinned at ~1e-4 by test_tf_parity_train.py,
        # so this band only covers the solver-on-garbage disagreement.
        rel_kp = np.abs(ours[:, 3] - ref[:, 3]) / np.maximum(np.abs(ref[:, 3]), 1e-6)
        assert rel_kp.max() < 0.15, f"kp loss diverges: ours {ours[:, 3]} vs ref {ref[:, 3]}"
    else:
        # estimate_coords=0: no keypoint loss on either side.
        np.testing.assert_array_equal(ours[:, 3], 0.0)
        np.testing.assert_array_equal(ref[:, 3], 0.0)

    # Summary metric rates must agree exactly on this scene.
    log = open(os.path.join(fixture, "ref_log.txt")).read()
    assert "2D Valid (mean):" in log, f"reference summary missing: {log[-500:]}"
    ref_2d = ref_3d = None
    for line in log.splitlines():
        if line.startswith("2D Valid (mean):"):
            ref_2d = float(line.split(":")[1])
        if line.startswith("3D Valid (mean):"):
            ref_3d = float(line.split(":")[1])
    assert float(np.mean(result["err_2d"])) == pytest.approx(ref_2d, abs=1e-6)
    assert float(np.mean(result["err_3d"])) == pytest.approx(ref_3d, abs=1e-6)
