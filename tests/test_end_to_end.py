"""End-to-end smoke tests: full training + evaluation drivers on a
synthetic on-disk NDDS dataset (tiny shapes, CPU)."""

import os
import sys
import types

import numpy as np
import pytest

from tests.test_data_pipeline import IMG_H, IMG_W, OBJECTS, _make_meshes, _make_scene


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=4)
    return data_root, mesh_root, str(root)


def _opt(data_root, mesh_root, outdir, **over):
    from casapose_tpu.utils.config import parse_config

    args = [
        "--data", data_root,
        "--datatest", data_root,
        "--datameshes", mesh_root,
        "--object", ",".join(OBJECTS),
        "--modelname", "casapose_c_gcu5",
        "--estimate_confidence", "1",
        "--estimate_coords", "1",
        "--confidence_regularization", "1",
        "--train_vectors_with_ground_truth", "1",
        "--filter_vertex_with_segmentation", "1",
        "--no_points", "9",
        "--imagesize", "64",
        "--imagesize_test", str(IMG_H), str(IMG_W),
        "--crop_factor", "1.0",
        "--batchsize", "2",
        "--epochs", "1",
        "--lr", "0.001",
        "--loginterval", "1",
        "--saveinterval", "1",
        "--validationinterval", "1",
        "--workers", "2",
        "--prefetch", "2",
        "--manualseed", "7",
        "--outf", os.path.join(outdir, "train_out"),
        "--translation", "0",
        "--rotation", "0",
        "--use_imgaug", "0",
        "--max_keypoint_pixel_error", "12.5",
        "--keypoint_loss_weight", "0.007",
        "--proxy_loss_weight", "0.015",
        "--min_object_size_test", "1",
    ]
    for k, v in over.items():
        args += [f"--{k}", str(v)]
    return parse_config(args)


@pytest.mark.parametrize("compute_dtype", ["float32", "bfloat16"])
def test_run_training_one_epoch(dataset, compute_dtype):
    from casapose_tpu.train import run_training

    data_root, mesh_root, outdir = dataset
    opt = _opt(data_root, mesh_root, os.path.join(outdir, compute_dtype))
    opt.compute_dtype = compute_dtype
    state = run_training(opt)
    assert state is not None
    # CSV telemetry written
    assert os.path.exists(os.path.join(opt.outf, "loss_train.csv"))
    assert os.path.exists(os.path.join(opt.outf, "test_summary.csv"))
    with open(os.path.join(opt.outf, "loss_train.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) >= 2  # header + at least one batch
    losses = [float(line.split(",")[2]) for line in lines[1:]]
    assert all(np.isfinite(losses))
    # checkpoint + portable weights saved
    assert os.path.exists(os.path.join(opt.outf, "frozen_model", "result_w.npz"))


def test_run_evaluation(dataset):
    from casapose_tpu.eval import run_evaluation

    data_root, mesh_root, outdir = dataset
    opt = _opt(
        data_root, mesh_root, outdir,
        train_vectors_with_ground_truth=0,
        write_poses=1,
    )
    opt.net = ""  # random weights, no checkpoint
    opt.evalf = os.path.join(outdir, "eval_out")
    opt.load_h5_weights = False
    result = run_evaluation(opt)
    assert np.all(np.isfinite(result["loss"]))
    assert result["err_3d"].shape == (len(OBJECTS),)
    assert os.path.exists(os.path.join(opt.evalf, "test_summary_eval.csv"))
    with open(os.path.join(opt.evalf, "test_summary_eval.csv")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2
    header_cols = lines[0].split(",")
    row_cols = lines[1].split(",")
    assert len(header_cols) == len(row_cols)
    # BOP pose export produced files
    assert os.path.isdir(os.path.join(opt.evalf, "poses_out"))
