"""End-to-end data pipeline on a synthetic on-disk NDDS dataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from casapose_tpu.data.mesh import load_ply_vertices, mesh_diameter
from casapose_tpu.data.ndds import VectorfieldDataset

K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
IMG_W, IMG_H = 320, 240
OBJECTS = ["obj_000001", "obj_000002"]
SEG_IDS = {"obj_000001": 100, "obj_000002": 200}


def _write_ply(path, verts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")


def _make_meshes(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    info = {}
    for name in OBJECTS:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        verts = rng.uniform(-30, 30, (50, 3))  # mm scale, like LM models
        _write_ply(os.path.join(d, name + ".ply"), verts)
        kps = rng.uniform(-25, 25, (9, 3))
        _write_ply(os.path.join(d, name + "_keypoints.ply"), kps)
        info[name] = {"diameter": mesh_diameter(verts)}
    with open(os.path.join(root, "models_info.json"), "w") as f:
        json.dump(info, f)


def _project(pts3d, RT):
    cam = pts3d @ RT[:, :3].T + RT[:, 3]
    uv = cam @ K.T
    return uv[:, :2] / uv[:, 2:]


def _make_scene(scene_dir, mesh_root, n_images=4):
    os.makedirs(scene_dir, exist_ok=True)
    # _object_settings: fixed transform scales mm -> m (0.01 scale + flip, as
    # the converter writes) — use 0.001 scale identity here.
    fixed = np.diag([0.001, 0.001, 0.001, 1.0])
    with open(os.path.join(scene_dir, "_object_settings.json"), "w") as f:
        json.dump(
            {
                "exported_objects": [
                    {
                        "class": name,
                        "segmentation_class_id": SEG_IDS[name],
                        # stored row-major; loader transposes
                        "fixed_model_transform": fixed.T.tolist(),
                    }
                    for name in OBJECTS
                ]
            },
            f,
        )
    with open(os.path.join(scene_dir, "_camera_settings.json"), "w") as f:
        json.dump(
            {
                "camera_settings": [
                    {"intrinsic_settings": {"fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2]}}
                ]
            },
            f,
        )

    rng = np.random.default_rng(42)
    kp_mesh = {name: load_ply_vertices(os.path.join(mesh_root, name, name + "_keypoints.ply")) for name in OBJECTS}
    for i in range(n_images):
        img = rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8)
        seg = np.zeros((IMG_H, IMG_W), np.uint8)
        objects = []
        for oi, name in enumerate(OBJECTS):
            Rm = Rotation.random(random_state=i * 10 + oi).as_matrix()
            t = np.array([0.02 * (oi - 0.5), 0.01, 0.5])
            RT = np.concatenate([Rm, t[:, None]], axis=1)
            kp3d_m = kp_mesh[name] @ np.diag([0.001] * 3)  # fixed transform applied
            kp2d = _project(kp3d_m, RT)
            # paint a blob roughly at the object center
            cx, cy = kp2d.mean(axis=0).astype(int)
            y0, y1 = max(cy - 25, 0), min(cy + 25, IMG_H)
            x0, x1 = max(cx - 25, 0), min(cx + 25, IMG_W)
            seg[y0:y1, x0:x1] = SEG_IDS[name]
            q = Rotation.from_matrix(Rm).as_quat()  # xyzw
            objects.append(
                {
                    "class": name,
                    "visibility": 1.0,
                    "location": t.tolist(),
                    "quaternion_xyzw": q.tolist(),
                    "keypoints_2d": kp2d.tolist(),
                    "keypoints_3d": kp3d_m.tolist(),
                    "px_count_all": int((seg == SEG_IDS[name]).sum()),
                }
            )
        Image.fromarray(img).save(os.path.join(scene_dir, f"{i:06d}.png"))
        Image.fromarray(seg).save(os.path.join(scene_dir, f"{i:06d}.seg.png"))
        with open(os.path.join(scene_dir, f"{i:06d}.json"), "w") as f:
            json.dump({"objects": objects}, f)


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
