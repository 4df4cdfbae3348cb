"""Offline end-to-end test of util_scripts/prepare_data.py (-lm flow).

Points BASE_URL at ``file://`` zips built from a tiny synthetic BOP
dataset and runs the full download -> selective-extract -> keypoint
overlay -> convert flow, then loads the produced NDDS tree with the real
``VectorfieldDataset``. VERDICT r2 item 10 — the last untested
util_script.
"""

import json
import os
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "util_scripts") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "util_scripts"))

from tests.test_dataset_converter import OBJ_IDS, _make_bop_dataset


def _zip_tree(zip_path, root, prefix=""):
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                full = os.path.join(dirpath, f)
                arc = os.path.join(prefix, os.path.relpath(full, root))
                zf.write(full, arc)


def test_prepare_data_lm_offline(tmp_path, monkeypatch):
    import prepare_data

    # --- build the three lm zips the -lm flow downloads, BOP layout:
    # lm_base.zip carries the dataset-prefixed skeleton; models/test zips
    # unpack INTO lm/ (matching prepare_data's idx==0 special case).
    # prepare_data's lm settings are fixed at 640x480 (the real LM size);
    # resize the synthetic generator accordingly.
    import tests.test_dataset_converter as tdc

    monkeypatch.setattr(tdc, "W", 640)
    monkeypatch.setattr(tdc, "H", 480)
    monkeypatch.setattr(tdc, "K", np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]]))

    stage = tmp_path / "stage"
    scene_src = stage / "scene"
    _make_bop_dataset(str(scene_src))

    base_dir = stage / "base" / "lm"
    os.makedirs(base_dir)
    with open(base_dir / "camera.json", "w") as f:
        json.dump({"width": 320, "height": 240}, f)

    models_dir = stage / "models_zip" / "models_eval"
    os.makedirs(models_dir)
    for oid in OBJ_IDS:
        src = scene_src / "models" / f"obj_{oid:06d}.ply"
        with open(src) as s, open(models_dir / f"obj_{oid:06d}.ply", "w") as d:
            d.write(s.read())
    with open(scene_src / "models" / "models_info.json") as s:
        info = json.load(s)
    with open(models_dir / "models_info.json", "w") as f:
        json.dump(info, f)

    test_dir = stage / "test_zip" / "test" / "000001"
    import shutil

    shutil.copytree(scene_src / "train_pbr" / "000000", test_dir)

    zips = tmp_path / "zips" / "lm"
    os.makedirs(zips)
    _zip_tree(str(zips / "lm_base.zip"), str(stage / "base"))
    _zip_tree(str(zips / "lm_models.zip"), str(stage / "models_zip"))
    _zip_tree(str(zips / "lm_test_all.zip"), str(stage / "test_zip"))

    # --- run the real flow against file:// URLs
    out = str(tmp_path / "out")
    monkeypatch.setattr(prepare_data, "BASE_URL", (tmp_path / "zips").as_uri() + "/")
    monkeypatch.setattr(sys, "argv", ["prepare_data.py", "-d", out, "-lm"])
    prepare_data.main()

    scene_out = os.path.join(out, "lm", "test", "000001", "rgb")
    for required in ["_camera_settings.json", "_object_settings.json", "000000.json",
                     "000000.png", "000000.seg.png"]:
        assert os.path.exists(os.path.join(scene_out, required)), required
    # keypoint overlay: converter used the repo-shipped keypoints for the
    # synthetic objects (ids 1 and 2 exist in data/datasets/lm)
    assert os.path.exists(os.path.join(out, "lm", "models", "obj_000001", "obj_000001_keypoints.ply"))

    # --- the produced tree loads through the real dataset
    from casapose_tpu.data.ndds import VectorfieldDataset

    ds = VectorfieldDataset(
        root=os.path.join(out, "lm", "test"),
        path_meshes=os.path.join(out, "lm", "models"),
        objectsofinterest=[f"obj_{oid:06d}" for oid in OBJ_IDS],
        color_input=True, random_crop=False, random_translation=(0, 0), random_rotation=0, no_points=9,
    )
    assert len(ds) == 2
    it, nb = ds.generate_dataset(1, 1, 2, (240, 320), 1.0, 1, len(OBJ_IDS), shuffle=False, seed=0)
    assert nb == 2
    batch = it.get_next()
    it.close()
    assert batch["img"].shape == (1, 240, 320, 3)
    assert np.isfinite(batch["keypoints2d"]).all()


def test_prepare_data_download_skips_existing(tmp_path):
    import prepare_data

    target = tmp_path / "dl"
    os.makedirs(target)
    with open(target / "x.zip", "w") as f:
        f.write("sentinel")
    # existing file short-circuits (no network touched for a bogus URL)
    out = prepare_data.download("https://0.0.0.0/none/x.zip", str(target))
    assert out == str(target / "x.zip")
    with open(out) as f:
        assert f.read() == "sentinel"
