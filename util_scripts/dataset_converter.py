#!/usr/bin/env python
"""BOP -> NDDS dataset conversion (offline tooling).

Rebuild of the reference's util_scripts/dataset_converter.py without the
pyrender/trimesh dependencies: parses BOP ``scene_gt / scene_camera /
scene_gt_info`` JSON, writes per-image NDDS JSON (projected keypoints,
cuboids, poses as xyzw quaternions), ``_camera_settings.json`` /
``_object_settings.json``, and segmentation masks merged from the BOP
``mask_visib`` images ("reuse" mode — the mode every shipped prepare_data
path uses; depth-rendered masks would need an offline renderer and are not
implemented).
"""

import glob
import json
import os
import re
import sys
from shutil import copyfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casapose_tpu.data.mesh import load_mesh_vertices  # noqa: E402
from casapose_tpu.pose.geometry import (  # noqa: E402
    create_transformation_matrix_np,
    get_horizontal_width_angle_np,
    matrix_to_quaternion_np,
    project_np,
)


def _oriented_bbox_corners(vertices):
    """8 corners of the PCA-oriented bounding box (trimesh's
    bounding_box_oriented analogue, sufficient for visualization cuboids)."""
    v = np.asarray(vertices, np.float64)
    c = v.mean(axis=0)
    centered = v - c
    _, _, Vt = np.linalg.svd(centered, full_matrices=False)
    proj = centered @ Vt.T
    lo, hi = proj.min(axis=0), proj.max(axis=0)
    corners = []
    for x in (lo[0], hi[0]):
        for y in (lo[1], hi[1]):
            for z in (lo[2], hi[2]):
                corners.append([x, y, z])
    return np.asarray(corners) @ Vt + c


def get_cam_matrix_bop(info):
    cam = np.eye(3)
    cam[0][0] = info["cam_K"][0]
    cam[1][1] = info["cam_K"][4]
    cam[0][2] = info["cam_K"][2]
    cam[1][2] = info["cam_K"][5]
    return cam


def load_json_info(files):
    cameras, gts, gt_infos = {}, {}, {}
    for file in files:
        name = os.path.basename(file)
        if name == "scene_gt.json":
            with open(file) as f:
                gts = json.load(f)
        elif name == "scene_camera.json":
            with open(file) as f:
                cameras = json.load(f)
        elif name == "scene_gt_info.json":
            with open(file) as f:
                gt_infos = json.load(f)

    cameras_out = {int(k): {"cam_mat": get_cam_matrix_bop(v)} for k, v in cameras.items()}
    gts_out = {}
    for k, objs in gts.items():
        rows = []
        for obj_gt in objs:
            r = obj_gt["cam_R_m2c"]
            rows.append(
                {
                    "id": obj_gt["obj_id"],
                    "t": obj_gt["cam_t_m2c"],
                    "R": np.array(r, np.float64).reshape(3, 3),
                }
            )
        gts_out[int(k)] = rows
    for k, objs in gt_infos.items():
        for i, obj_gt in enumerate(objs):
            row = gts_out[int(k)][i]
            row["bb"] = obj_gt["bbox_obj"]
            row["bb_visib"] = obj_gt["bbox_visib"]
            row["px_count_all"] = obj_gt["px_count_all"]
            row["px_count_valid"] = obj_gt["px_count_valid"]
            row["px_count_visib"] = obj_gt["px_count_visib"]
            row["visib_fract"] = obj_gt["visib_fract"]
    return cameras_out, gts_out


def load_models_bop(path, path_root_out, copy_meshes=False):
    os.makedirs(path_root_out, exist_ok=True)
    info_file = os.path.join(path, "models_info.json")
    if not os.path.isfile(info_file):
        return {}
    model_files = sorted(glob.glob(path + "/*.ply"))
    kp_files = sorted(glob.glob(path + "/*keypoints.ply"))
    model_files = [m for m in model_files if m not in kp_files]
    if not model_files:
        model_files = sorted(glob.glob(path + "/*.obj"))

    meshes = {}
    for model_file, kp_file in zip(model_files, kp_files):
        name = os.path.splitext(os.path.basename(model_file))[0]
        d_model = re.findall(r"\d+", name)
        d_kp = re.findall(r"\d+", os.path.basename(kp_file))
        if d_model and d_kp and int(d_model[0]) == int(d_kp[0]):
            idx = int(d_model[0])
            kps = load_mesh_vertices(kp_file)
            verts = load_mesh_vertices(model_file)
            meshes[idx] = {
                "name": name,
                "id": idx,
                "keypoints": kps,
                "volume": _oriented_bbox_corners(verts),
                "volume_size": (np.max(kps, 0) - np.min(kps, 0)).tolist(),
                "center": ((np.max(kps, 0) + np.min(kps, 0)) / 2.0),
                "counter": 0,
                "fixed_model_transform": np.eye(4),
            }
        if copy_meshes:
            out_dir = os.path.join(path_root_out, name)
            os.makedirs(out_dir, exist_ok=True)
            copyfile(model_file, os.path.join(out_dir, name + ".ply"))
            copyfile(kp_file, os.path.join(out_dir, name + "_keypoints.ply"))
    if copy_meshes and os.path.isfile(info_file):
        copyfile(info_file, os.path.join(path_root_out, "models_info.json"))
    return meshes


def write_camera_setting(path, name, camera_matrix, width, height):
    fx, fy = camera_matrix[0][0], camera_matrix[1][1]
    data = {
        "camera_settings": [
            {
                "name": name,
                "horizontal_fov": float(get_horizontal_width_angle_np(width, height, fx, fy)),
                "intrinsic_settings": {
                    "resX": width,
                    "resY": height,
                    "fx": float(fx),
                    "fy": float(fy),
                    "cx": float(camera_matrix[0][2]),
                    "cy": float(camera_matrix[1][2]),
                    "s": 0,
                },
                "captured_image_size": {"width": width, "height": height},
            }
        ]
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def write_object_settings(path, meshes):
    data = {"exported_object_classes": [], "exported_objects": []}
    for mesh in meshes.values():
        if mesh["counter"] > 0:
            data["exported_object_classes"].append(mesh["name"])
            data["exported_objects"].append(
                {
                    "class": mesh["name"],
                    "segmentation_class_id": mesh["id"],
                    "segmentation_instance_id": 0,
                    "fixed_model_transform": np.asarray(mesh["fixed_model_transform"]).tolist(),
                    "cuboid_dimensions": list(mesh["volume_size"]),
                }
            )
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def create_ndds_json(path, camera_matrix, gt, meshes):
    data = {
        "camera_data": {
            "location_worldframe": [0.0, 0.0, 0.0],
            "quaternion_xyzw_worldframe": [0.0, 0.0, 0.0, 1.0],
        },
        "objects": [],
    }
    for mesh_gt in gt:
        object_id = mesh_gt["id"]
        if object_id not in meshes:
            continue
        t = mesh_gt["t"]
        R = mesh_gt["R"]
        bb = mesh_gt.get("bb", [0, 0, 0, 0])
        pose = create_transformation_matrix_np(R, t)
        meshes[object_id]["counter"] += 1
        center = np.expand_dims(meshes[object_id]["center"], 0)
        center_2d, center_3d = project_np(center, camera_matrix, pose[0:3])
        cuboid_2d, cuboid_3d = project_np(meshes[object_id]["volume"], camera_matrix, pose[0:3])
        kp_2d, kp_3d = project_np(meshes[object_id]["keypoints"], camera_matrix, pose[0:3])
        info = {
            "class": meshes[object_id]["name"],
            "instance_id": 0,
            "visibility": mesh_gt.get("visib_fract", 1),
            "location": list(t),
            "quaternion_xyzw": matrix_to_quaternion_np(R).tolist(),
            "pose_transform": np.transpose(pose).tolist(),
            "cuboid_centroid": center_3d[0].tolist(),
            "projected_cuboid_centroid": center_2d[0].tolist(),
            "bounding_box": {
                "top_left": [bb[0], bb[1]],
                "bottom_right": [bb[0] + bb[2], bb[1] + bb[3]],
            },
            "cuboid": cuboid_3d.tolist(),
            "projected_cuboid": cuboid_2d.tolist(),
            "keypoints_2d": kp_2d.tolist(),
            "keypoints_3d": kp_3d.tolist(),
        }
        for key in ("px_count_all", "px_count_valid", "px_count_visib"):
            if key in mesh_gt:
                info[key] = mesh_gt[key]
        if "bb_visib" in mesh_gt:
            bbv = mesh_gt["bb_visib"]
            info["bounding_box_visible"] = {
                "top_left": [bbv[0], bbv[1]],
                "bottom_right": [bbv[0] + bbv[2], bbv[1] + bbv[3]],
            }
        data["objects"].append(info)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    return meshes


def create_bop_mask(path, path_out, gt, digits, width, height, filetype):
    mask = np.zeros([height, width], np.uint8)
    path = path.replace("rgb", "mask_visib")
    for idx, mesh_gt in enumerate(gt):
        path_new = path.replace(digits + "." + filetype, digits + "_" + str(idx).zfill(6) + ".png")
        arr = np.array(Image.open(path_new))
        mask[arr == 255] = mesh_gt["id"]
    Image.fromarray(mask).save(path_out)


def parse_bop(root, root_out, meshes, settings):
    def update_bop_files(path, info, gt, meshes):
        filetype = "." + settings["filetype_in"]
        files = sorted(glob.glob(path + "/[0-9][0-9][0-9][0-9][0-9][0-9]" + filetype))
        if files:
            os.makedirs(path.replace(root, root_out), exist_ok=True)
        for filepath in files:
            digits = re.findall(r"\d+", os.path.basename(filepath))
            if not digits:
                continue
            filepath_out = filepath.replace(root, root_out)
            if filepath_out != filepath:
                copyfile(filepath, filepath_out)
            idx = int(digits[0])
            camera_matrix = info[idx]["cam_mat"]
            meshes = create_ndds_json(filepath_out.replace(filetype, ".json"), camera_matrix, gt[idx], meshes)
            if settings["mask"] == "reuse":
                create_bop_mask(
                    filepath,
                    filepath_out.replace(filetype, ".seg.png"),
                    gt[idx],
                    digits[0],
                    settings["width"],
                    settings["height"],
                    settings["filetype_in"],
                )
            elif settings["mask"] == "render":
                raise NotImplementedError(
                    "render-mode masks need an offline renderer; all shipped dataset flows use 'reuse'"
                )
        return meshes

    def explore(path, meshes):
        if not os.path.isdir(path):
            return
        folder_names = [o for o in os.listdir(path) if os.path.isdir(os.path.join(path, o))]
        if "rgb" in folder_names:
            path_out = path.replace(root, root_out)
            os.makedirs(os.path.join(path_out, "rgb"), exist_ok=True)
            for mesh in meshes.values():
                mesh["counter"] = 0
            files = sorted(glob.glob(path + "/*.json"))
            info, gt = load_json_info(files)
            camera_matrix = next(iter(info.values()))["cam_mat"]
            write_camera_setting(
                os.path.join(path_out, "rgb", "_camera_settings.json"),
                "Viewpoint",
                camera_matrix,
                settings["width"],
                settings["height"],
            )
            update_bop_files(os.path.join(path, "rgb"), info, gt, meshes)
            write_object_settings(os.path.join(path_out, "rgb", "_object_settings.json"), meshes)
        else:
            for folder in folder_names:
                explore(os.path.join(path, folder), meshes)

    os.makedirs(root_out, exist_ok=True)
    explore(root, meshes)


def update_data(path, path_out, meshes, settings):
    os.makedirs(path_out, exist_ok=True)
    for name in sorted(os.listdir(str(path))):
        parse_bop(os.path.join(path, name), os.path.join(path_out, name), meshes, settings)


def generate_data(dataset_path, dataset_path_out, settings, model_folder="models", model_folder_out="models",
                  image_folder="train_pbr"):
    path_models = os.path.join(dataset_path, model_folder)
    path_models_out = os.path.join(dataset_path_out, model_folder_out)
    path_images = os.path.join(dataset_path, image_folder)
    path_images_out = os.path.join(dataset_path_out, image_folder)
    meshes = load_models_bop(path_models, path_models_out, settings["copy_meshes"])
    update_data(path_images, path_images_out, meshes, settings)
