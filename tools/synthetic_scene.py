"""Deterministic synthetic NDDS scene + mesh generator.

Shared by the test suite (tests/test_data_pipeline.py) and the TF
reference oracle (tools/tf_reference_oracle.py ``train`` command): both
frameworks' data pipelines scan the same on-disk scene, so cross-framework
parity runs need the generator importable without jax OR tensorflow.

The scene follows the NDDS layout the reference's ``VectorfieldDataset``
scans (reference casapose/data_handler/vectorfield_dataset.py:417-520):
``_object_settings.json`` / ``_camera_settings.json`` per scene dir,
``NNNNNN.png`` + ``NNNNNN.seg.png`` + ``NNNNNN.json`` per frame, and a BOP
``models_info.json`` + per-object keypoint PLYs on the mesh side.

Everything is seeded: the same (scene_dir, n_images) always produces
byte-identical files, so oracle fixtures keyed on argv stay valid.
"""

import json
import os

import numpy as np

K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
IMG_W, IMG_H = 320, 240
OBJECTS = ["obj_000001", "obj_000002"]
SEG_IDS = {"obj_000001": 100, "obj_000002": 200}


def object_names(n=None):
    """Object list for an n-object scene; None = the legacy 2-object scene
    (whose on-disk bytes are pinned by committed oracle fixture keys)."""
    if n is None:
        return OBJECTS
    return [f"obj_{i:06d}" for i in range(1, n + 1)]


def _seg_ids(objects):
    if objects == OBJECTS:
        return dict(SEG_IDS)
    # Custom lists (e.g. the 13-object config): spaced uint8 ids.
    return {name: 15 * (i + 1) for i, name in enumerate(objects)}


def write_ply(path, verts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")


def read_ply(path):
    verts = []
    with open(path) as f:
        n = 0
        for line in f:
            line = line.strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        for _ in range(n):
            verts.append([float(v) for v in f.readline().split()[:3]])
    return np.asarray(verts, np.float64)


def _diameter(verts):
    d2 = ((verts[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))


def make_meshes(root, objects=None):
    objects = objects or OBJECTS
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    info = {}
    for name in objects:
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        verts = rng.uniform(-30, 30, (50, 3))  # mm scale, like LM models
        write_ply(os.path.join(d, name + ".ply"), verts)
        kps = rng.uniform(-25, 25, (9, 3))
        write_ply(os.path.join(d, name + "_keypoints.ply"), kps)
        info[name] = {"diameter": _diameter(verts)}
    with open(os.path.join(root, "models_info.json"), "w") as f:
        json.dump(info, f)


def project(pts3d, RT):
    cam = pts3d @ RT[:, :3].T + RT[:, 3]
    uv = cam @ K.T
    return uv[:, :2] / uv[:, 2:]


def make_scene(scene_dir, mesh_root, n_images=4, objects=None):
    from PIL import Image
    from scipy.spatial.transform import Rotation

    legacy = objects is None or objects == OBJECTS
    objects = objects or OBJECTS
    seg_ids = _seg_ids(objects)
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
                        "segmentation_class_id": seg_ids[name],
                        # stored row-major; loader transposes
                        "fixed_model_transform": fixed.T.tolist(),
                    }
                    for name in objects
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
    kp_mesh = {name: read_ply(os.path.join(mesh_root, name, name + "_keypoints.ply")) for name in objects}
    for i in range(n_images):
        img = rng.integers(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8)
        seg = np.zeros((IMG_H, IMG_W), np.uint8)
        gt_objects = []
        for oi, name in enumerate(objects):
            if legacy:
                Rm = Rotation.random(random_state=i * 10 + oi).as_matrix()
                t = np.array([0.02 * (oi - 0.5), 0.01, 0.5])
                blob = 25
            else:
                # Many-object scenes (e.g. the 13-object config): place
                # each object on a 5-per-row pixel grid by back-projecting
                # the grid cell at Z=0.5 m, so blobs never overlap and
                # every object stays fully visible.
                Rm = Rotation.random(random_state=i * 100 + oi).as_matrix()
                px = 40.0 + 60.0 * (oi % 5)
                py = 40.0 + 80.0 * (oi // 5)
                z = 0.5
                t = np.array([(px - K[0, 2]) / K[0, 0] * z, (py - K[1, 2]) / K[1, 1] * z, z])
                blob = 18
            RT = np.concatenate([Rm, t[:, None]], axis=1)
            kp3d_m = kp_mesh[name] @ np.diag([0.001] * 3)  # fixed transform applied
            kp2d = project(kp3d_m, RT)
            # paint a blob roughly at the object center
            cx, cy = kp2d.mean(axis=0).astype(int)
            y0, y1 = max(cy - blob, 0), min(cy + blob, IMG_H)
            x0, x1 = max(cx - blob, 0), min(cx + blob, IMG_W)
            seg[y0:y1, x0:x1] = seg_ids[name]
            q = Rotation.from_matrix(Rm).as_quat()  # xyzw
            gt_objects.append(
                {
                    "class": name,
                    "visibility": 1.0,
                    "location": t.tolist(),
                    "quaternion_xyzw": q.tolist(),
                    "keypoints_2d": kp2d.tolist(),
                    "keypoints_3d": kp3d_m.tolist(),
                    "px_count_all": int((seg == seg_ids[name]).sum()),
                }
            )
        Image.fromarray(img).save(os.path.join(scene_dir, f"{i:06d}.png"))
        Image.fromarray(seg).save(os.path.join(scene_dir, f"{i:06d}.seg.png"))
        with open(os.path.join(scene_dir, f"{i:06d}.json"), "w") as f:
            json.dump({"objects": gt_objects}, f)
