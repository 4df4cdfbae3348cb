"""End-to-end cross-framework parity: BOTH eval harnesses on one scene.

Runs the REFERENCE ``test_casapose.py`` (via tools/run_reference_eval.py,
the actual reference script executed under runpy with dependency shims) and
our ``run_evaluation`` on the same synthetic NDDS scene with the same
reference-generated h5 weights, then compares the per-image loss CSVs and
the summary metrics.

What this pins down end-to-end: dataset scan + GT JSON parse + batch
assembly + GT vector fields + forward pass + LS voting + loss computation.
The keypoint loss additionally goes through pose estimation (reference:
cv2.solvePnP on the host; ours: on-device EPnP+LM), so it gets a looser
band — on garbage coordinates the two solvers legitimately disagree.

VERDICT round-1 item 1 (iii).
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data_pipeline import OBJECTS, _make_meshes, _make_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _run(args, timeout=560):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(args, capture_output=True, text=True, timeout=timeout, env=env)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_e2e")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=3)

    oracle = str(root / "oracle")
    proc = _run(
        [sys.executable, os.path.join(REPO, "tools", "tf_reference_oracle.py"), "forward",
         "--model", "casapose_c_gcu5", "--height", "64", "--width", "64",
         "--objects", str(len(OBJECTS)), "--out", oracle]
    )
    if proc.returncode != 0:
        pytest.skip(f"TF oracle unavailable: {proc.stderr[-500:]}")
    return root, data_root, mesh_root, oracle


def _flags(data_root, mesh_root, outf, evalf, h5):
    return [
        "--data", str(data_root) + "_none",  # != datatest: no validation split
        "--datatest", data_root, "--datameshes", mesh_root,
        "--object", ",".join(OBJECTS), "--modelname", "casapose_c_gcu5",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", "9",
        "--imagesize_test", "240", "320", "--train_vectors_with_ground_truth", "0",
        "--load_h5_weights", "1", "--load_h5_filename", h5,
        "--outf", outf, "--evalf", evalf, "--min_object_size_test", "1",
        "--workers", "1", "--prefetch", "1", "--manualseed", "3",
    ]


def _read_losses(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return np.array([[float(r["mask_loss"]), float(r["vertex_loss"]), float(r["proxy_loss"]),
                      float(r["kp_loss"])] for r in rows])


def test_eval_harness_parity(scene):
    root, data_root, mesh_root, oracle = scene

    # --- reference harness (the actual test_casapose.py) ---
    ref_out = str(root / "ref_out")
    ref_eval = str(root / "ref_eval")
    os.makedirs(os.path.join(ref_out, "frozen_model"), exist_ok=True)
    import shutil

    shutil.copyfile(os.path.join(oracle, "weights.h5"), os.path.join(ref_out, "frozen_model", "weights.h5"))
    proc = _run(
        [sys.executable, os.path.join(REPO, "tools", "run_reference_eval.py")]
        + _flags(data_root, mesh_root, ref_out, ref_eval, "weights")
        + ["--backbone", "resnet18"]
    )
    if proc.returncode != 0:
        pytest.skip(f"reference harness unavailable: {proc.stderr[-500:]}")

    # --- our harness ---
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    our_out = str(root / "our_out")
    our_eval = str(root / "our_eval")
    opt = parse_config(_flags(data_root, mesh_root, our_out, our_eval, os.path.join(oracle, "weights")))
    result = run_evaluation(opt)

    ref = _read_losses(os.path.join(ref_eval, "loss_test_eval.csv"))
    ours = _read_losses(os.path.join(our_eval, "loss_test_eval.csv"))
    assert ref.shape == ours.shape, f"batch count differs: {ref.shape} vs {ours.shape}"

    # mask / vertex / proxy: no PnP in the path -> tight agreement.
    for j, name, tol in ((0, "mask", 0.01), (1, "vertex", 0.01), (2, "proxy", 0.01)):
        rel = np.abs(ours[:, j] - ref[:, j]) / np.maximum(np.abs(ref[:, j]), 1e-6)
        assert rel.max() < tol, f"{name} loss diverges: ours {ours[:, j]} vs ref {ref[:, j]}"

    # keypoint loss embeds pose estimation (cv2 vs on-device EPnP+LM).
    rel_kp = np.abs(ours[:, 3] - ref[:, 3]) / np.maximum(np.abs(ref[:, 3]), 1e-6)
    assert rel_kp.max() < 0.25, f"kp loss diverges: ours {ours[:, 3]} vs ref {ref[:, 3]}"

    # Summary metric rates must agree exactly on this scene.
    # (tf.print routes to stderr; parse both streams.)
    out = proc.stdout + "\n" + proc.stderr
    assert "2D Valid (mean):" in out, f"reference summary missing: {out[-500:]}"
    for line in out.splitlines():
        if line.startswith("2D Valid (mean):"):
            ref_2d = float(line.split(":")[1])
        if line.startswith("3D Valid (mean):"):
            ref_3d = float(line.split(":")[1])
    assert float(np.mean(result["err_2d"])) == pytest.approx(ref_2d, abs=1e-6)
    assert float(np.mean(result["err_3d"])) == pytest.approx(ref_3d, abs=1e-6)
