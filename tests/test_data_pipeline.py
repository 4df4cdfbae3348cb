"""End-to-end data pipeline on a synthetic on-disk NDDS dataset."""

import json
import os
import sys

import numpy as np
import pytest

from casapose_tpu.data.mesh import load_ply_vertices
from casapose_tpu.data.ndds import VectorfieldDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
# Scene generation is shared with the TF oracle (tools/synthetic_scene.py)
# so cross-framework train/eval parity runs scan the identical dataset.
from synthetic_scene import IMG_H, IMG_W, K, OBJECTS, SEG_IDS  # noqa: E402
from synthetic_scene import make_meshes as _make_meshes  # noqa: E402
from synthetic_scene import make_scene as _make_scene  # noqa: E402
from synthetic_scene import project as _project  # noqa: E402


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ndds")
    mesh_root = str(root / "models")
    data_root = str(root / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root)
    return data_root, mesh_root


def test_dataset_scan_and_meshes(synthetic_dataset):
    data_root, mesh_root = synthetic_dataset
    ds = VectorfieldDataset(
        root=data_root, path_meshes=mesh_root, objectsofinterest=OBJECTS, random_crop=False,
        random_translation=(0, 0), random_rotation=0,
    )
    assert len(ds) == 4
    assert set(ds.meshes.keys()) == set(OBJECTS)
    va, vc = ds.generate_object_vertex_array()
    assert va.shape == (2, 50, 3)
    assert vc.tolist() == [[50], [50]]
    # fixed transform applied: vertices scaled to meters
    assert np.abs(va).max() < 0.05


def test_pipeline_batches_and_schema(synthetic_dataset):
    data_root, mesh_root = synthetic_dataset
    ds = VectorfieldDataset(
        root=data_root, path_meshes=mesh_root, objectsofinterest=OBJECTS, color_input=True,
        random_crop=True, random_translation=(0, 0), random_rotation=0, no_points=9,
    )
    it, batches = ds.generate_dataset(2, 1, 2, (224, 224), 0.9333, 2, len(OBJECTS), shuffle=True, seed=0)
    assert batches == 2
    batch = it.get_next()
    it.close()
    assert batch["img"].shape == (2, 224, 224, 3)
    assert batch["seg"].shape == (2, 224, 224, 1)
    assert batch["keypoints2d"].shape == (2, 2, 1, 9, 2)
    assert batch["keypoints3d"].shape == (2, 2, 1, 9, 3)
    assert batch["camera"].shape == (2, 3, 3)
    assert batch["diameters"].shape == (2, 2, 1, 1)
    assert batch["offsets"].shape == (2, 10)
    assert batch["cuboid3d"].shape == (2, 2, 1, 8, 3)
    assert batch["poses_gt"].shape == (2, 2, 1, 3, 4)
    assert batch["pixel_gt_count"].shape == (2, 2, 1, 1)
    assert batch["image_id"].shape == (2, 1)
    # label remap: only 0 / 1 / 2 in the label map
    assert set(np.unique(batch["seg"])).issubset({0, 1, 2})
    # diameters in meters after fixed-transform scaling
    assert 0.0 < batch["diameters"].max() < 0.2


def test_keypoint_projection_consistency(synthetic_dataset):
    """GT keypoints2d (y, x, network space) must match projecting
    keypoints3d with poses_gt and mapping through the offsets."""
    data_root, mesh_root = synthetic_dataset
    ds = VectorfieldDataset(
        root=data_root, path_meshes=mesh_root, objectsofinterest=OBJECTS, random_crop=False,
        random_translation=(0, 0), random_rotation=0,
    )
    it, _ = ds.generate_dataset(1, 1, 2, (IMG_H, IMG_W), 1.0, 1, len(OBJECTS), shuffle=False, seed=0)
    batch = it.get_next()
    it.close()
    for oi in range(2):
        kp3d = batch["keypoints3d"][0, oi, 0]
        pose = batch["poses_gt"][0, oi, 0]
        proj = _project(kp3d.astype(np.float64), pose.astype(np.float64))  # (x, y)
        got = batch["keypoints2d"][0, oi, 0][:, ::-1]  # (y, x) -> (x, y)
        np.testing.assert_allclose(got, proj, atol=0.1)


def test_record_cache_roundtrip_and_invalidation(synthetic_dataset, tmp_path):
    """RecordCache: hit returns identical arrays; stale entries invalidate."""
    import time

    from casapose_tpu.data.pipeline import RecordCache, _decode_image, _decode_seg

    data_root, _ = synthetic_dataset
    img_path = os.path.join(data_root, "000000", "000000.png")
    seg_path = os.path.join(data_root, "000000", "000000.seg.png")
    cache = RecordCache(str(tmp_path / "rc"))
    calls = []

    def decode():
        calls.append(1)
        return _decode_image(img_path, True), _decode_seg(seg_path)

    img1, seg1 = cache.get(0, img_path, seg_path, decode)
    img2, seg2 = cache.get(0, img_path, seg_path, decode)
    assert len(calls) == 1, "second access must be served from cache"
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(seg1, seg2)

    # touching the source invalidates the entry (key includes mtime/size)
    time.sleep(0.01)
    os.utime(img_path)
    cache.get(0, img_path, seg_path, decode)
    assert len(calls) == 2, "stale cache entry must be re-decoded"


def test_loader_with_record_cache_matches_uncached(synthetic_dataset, tmp_path):
    """The cached pipeline emits byte-identical batches."""
    data_root, mesh_root = synthetic_dataset

    def batches(cache_dir):
        ds = VectorfieldDataset(
            root=data_root, path_meshes=mesh_root, objectsofinterest=OBJECTS, random_crop=False,
            random_translation=(0, 0), random_rotation=0, record_cache_dir=cache_dir,
        )
        it, _ = ds.generate_dataset(2, 1, 2, (IMG_H, IMG_W), 1.0, 1, len(OBJECTS), shuffle=False, seed=0)
        b = it.get_next()
        it.close()
        return b

    plain = batches(None)
    warm = batches(str(tmp_path / "rc2"))  # first pass fills
    cached = batches(str(tmp_path / "rc2"))  # second pass reads
    for k in plain:
        np.testing.assert_array_equal(plain[k], warm[k], err_msg=k)
        np.testing.assert_array_equal(plain[k], cached[k], err_msg=k)
