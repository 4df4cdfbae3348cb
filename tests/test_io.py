"""BOP pose writer: format and time-column parity (io_utils.py:54-138)."""

import os

import numpy as np

from casapose_tpu.utils.io import write_poses


def _poses(n):
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(n, 1, 3, 4)).astype(np.float32)
    est = rng.normal(size=(n, 3, 4)).astype(np.float32)
    return gt, est


def test_write_poses_time_column(tmp_path):
    gt, est = _poses(2)
    out = str(tmp_path) + "/"
    write_poses(gt, est, ["obj_000001", "obj_000005"], "data_000002_000123", out, time_needed=0.0625)
    csv_path = os.path.join(out, "bop_evaluation.csv")
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    for line in lines[1:]:
        cols = line.split(",")
        assert cols[0] == "2" and cols[1] == "123"
        assert float(cols[-1]) == 0.0625  # measured per-image time, not -1
    assert [line.split(",")[2] for line in lines[1:]] == ["1", "5"]


def test_write_poses_default_time_is_sentinel(tmp_path):
    gt, est = _poses(1)
    out = str(tmp_path) + "/"
    write_poses(gt, est, ["obj_000001"], "data_000000_000001", out)
    lines = open(os.path.join(out, "bop_evaluation.csv")).read().strip().splitlines()
    assert lines[1].endswith(",-1.0")
