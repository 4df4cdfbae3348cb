"""--quantized_inference int8 drives the full eval harness.

Pins the CLI wiring (utils/config.py flag -> eval.py::build_test_step ->
ops/quant.py::quantized_apply) end to end: the quantized step must run the
whole pipeline (forward -> voting -> PnP -> metrics -> BOP export) with
finite losses, and its segmentation-dependent metric counters must stay in
the valid range. Numeric fidelity bands live in tests/test_quant.py; this
is the integration surface.
"""

import glob
import os

import numpy as np
import pytest

from tests.test_data_pipeline import _make_meshes, _make_scene

pytestmark = pytest.mark.slow


def test_quantized_eval_harness(tmp_path):
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    mesh_root = str(tmp_path / "models")
    data_root = str(tmp_path / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=2)

    outf = str(tmp_path / "out")
    evalf = str(tmp_path / "eval")
    opt = parse_config([
        "--data", data_root + "_none", "--datatest", data_root, "--datameshes", mesh_root,
        "--object", "obj_000001,obj_000002", "--modelname", "casapose_c_gcu5",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", "9",
        "--imagesize_test", "240", "320", "--train_vectors_with_ground_truth", "0",
        "--outf", outf, "--evalf", evalf, "--min_object_size_test", "1",
        "--workers", "1", "--prefetch", "1", "--manualseed", "3",
        "--write_poses", "1", "--quantized_inference", "int8",
    ])
    result = run_evaluation(opt)

    assert np.all(np.isfinite(result["loss"])), f"non-finite quantized eval losses: {result['loss']}"
    for key in ("err_2d", "err_3d", "precision"):
        v = np.asarray(result[key])
        assert np.all((v >= 0) & (v <= 1)), f"{key} out of range under int8: {v}"
    assert os.path.exists(os.path.join(evalf, "test_summary_eval.csv"))
    poses = glob.glob(os.path.join(evalf, "poses_out", "*", "*.txt"))
    assert len(poses) > 0, "quantized eval exported no poses"
