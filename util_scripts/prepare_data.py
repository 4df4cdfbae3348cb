#!/usr/bin/env python
"""Download + convert BOP datasets (LM / LMO / HB) into NDDS format.

Rebuild of the reference's util_scripts/prepare_data.py: fetches the BOP
zips from HuggingFace, extracts selectively (eval models only; HB model
remap), builds the lm/lmo/hb/train_pbr/val_pbr trees (train scene 000049
becomes validation), overlays the repo-shipped keypoint PLYs
(data/datasets/{lm,hb}), then runs the converter per dataset.

Usage: python util_scripts/prepare_data.py -d PATH [-lm] [-lmo] [-pbr] [-hb] [-bop] [-c]
"""

import argparse
import glob
import os
import shutil
import sys
import urllib.request
from zipfile import ZipFile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataset_converter import generate_data  # noqa: E402

BASE_URL = "https://huggingface.co/datasets/bop-benchmark/datasets/resolve/main/"


def download(url, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, os.path.basename(url))
    if os.path.exists(fname):
        return fname
    print(f"downloading {url}")
    urllib.request.urlretrieve(url, fname)
    return fname


def copydir(source, dest):
    for root, _, files in os.walk(source):
        rel = os.path.relpath(root, source)
        os.makedirs(os.path.join(dest, rel), exist_ok=True)
        for f in files:
            shutil.copyfile(os.path.join(root, f), os.path.join(dest, rel, f))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--download_path", required=True)
    parser.add_argument("-lm", "--gen_lm", action="store_true")
    parser.add_argument("-lmo", "--gen_lmo", action="store_true")
    parser.add_argument("-pbr", "--gen_train", action="store_true")
    parser.add_argument("-bop", "--gen_bop", action="store_true")
    parser.add_argument("-hb", "--gen_hb", action="store_true")
    parser.add_argument("-c", "--cleanup", action="store_true")
    args = parser.parse_args()

    tmp_path = os.path.join(args.download_path, "tmp")
    out_path = args.download_path
    lm_path = os.path.join(tmp_path, "lm")
    lmo_path = os.path.join(tmp_path, "lmo")
    hb_path = os.path.join(tmp_path, "hb")

    downloads = {"lm": ["lm/lm_base.zip", "lm/lm_models.zip"]}
    hb_models = {
        "obj_000002.ply": "obj_000002.ply",
        "obj_000007.ply": "obj_000008.ply",
        "obj_000021.ply": "obj_000015.ply",
    }
    if args.gen_hb:
        downloads["hb"] = ["hb/hb_base.zip", "hb/hb_models.zip", "hb/hb_val_primesense.zip", "hb/hb_val_kinect.zip"]
    if args.gen_lmo:
        downloads["lmo"] = ["lmo/lmo_base.zip", "lmo/lmo_test_all.zip"]
        if args.gen_bop:
            downloads["lmo"].append("lmo/lmo_test_bop19.zip")
    if args.gen_lm:
        if args.gen_bop:
            downloads["lm"].append("lm/lm_test_bop19.zip")
        downloads["lm"].append("lm/lm_test_all.zip")
    if args.gen_train:
        downloads["lm"].append("lm/lm_train_pbr.zip")

    os.makedirs(tmp_path, exist_ok=True)
    for dataset, filenames in downloads.items():
        for filename in filenames:
            download(BASE_URL + filename, tmp_path)

    for dataset, filenames in downloads.items():
        for idx, filename_ in enumerate(filenames):
            filename = os.path.basename(filename_)
            tmp_dataset_path = tmp_path if idx == 0 else os.path.join(tmp_path, dataset)
            with ZipFile(os.path.join(tmp_path, filename)) as zf:
                if "models" in filename:
                    for member in zf.namelist():
                        if "eval" in member:
                            if dataset == "hb":
                                for src, dst in hb_models.items():
                                    if src in member:
                                        zf.extract(member, tmp_dataset_path)
                                        p = os.path.join(tmp_dataset_path, member)
                                        os.rename(p, p.replace(src, dst))
                            else:
                                zf.extract(member, tmp_dataset_path)
                elif dataset == "hb" and "val" in filename:
                    for member in zf.namelist():
                        if "/000002/" in member:
                            zf.extract(member, tmp_dataset_path)
                else:
                    zf.extractall(tmp_dataset_path)
                if "bop19" in filename:
                    os.rename(os.path.join(tmp_path, dataset, "test"), os.path.join(tmp_path, dataset, "test_bop"))
            if args.cleanup:
                os.remove(os.path.join(tmp_path, filename))

    if args.gen_hb:
        os.rename(os.path.join(hb_path, "val_primesense"), os.path.join(hb_path, "test_primesense"))
        os.rename(os.path.join(hb_path, "val_kinect"), os.path.join(hb_path, "test_kinect"))
        for src in sorted(glob.glob(os.path.join(lm_path, "models_eval", "*.ply"))):
            dst = src.replace(os.path.join("lm", "models_eval"), os.path.join("hb", "models_eval"))
            if not os.path.exists(dst):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)

    if args.gen_train:
        os.makedirs(os.path.join(lm_path, "val_pbr"), exist_ok=True)
        shutil.copytree(os.path.join(lm_path, "train_pbr", "000049"), os.path.join(lm_path, "val_pbr", "000049"))
        shutil.rmtree(os.path.join(lm_path, "train_pbr", "000049"))

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.gen_hb:
        copydir(os.path.join(repo_root, "data/datasets/hb"), hb_path)
    copydir(os.path.join(repo_root, "data/datasets/lm"), lm_path)

    settings = {
        "near": 100, "far": 2000, "width": 640, "height": 480,
        "filetype_in": "png", "mask": "reuse", "draw_debug_image": False,
    }
    if args.gen_lmo:
        settings["copy_meshes"] = True
        generate_data(lmo_path, os.path.join(out_path, "lmo"), settings, model_folder="../lm/models_eval",
                      image_folder="test")
        if args.gen_bop:
            settings["copy_meshes"] = False
            generate_data(lmo_path, os.path.join(out_path, "lmo"), settings, model_folder="../lm/models_eval",
                          image_folder="test_bop")
    if args.gen_lm:
        settings["copy_meshes"] = True
        generate_data(lm_path, os.path.join(out_path, "lm"), settings, model_folder="models_eval",
                      image_folder="test")
        if args.gen_bop:
            settings["copy_meshes"] = False
            generate_data(lm_path, os.path.join(out_path, "lm"), settings, model_folder="models_eval",
                          image_folder="test_bop")
    if args.gen_train:
        settings["copy_meshes"] = True
        settings["filetype_in"] = "jpg"
        generate_data(lm_path, os.path.join(out_path, "lm"), settings, model_folder="models_eval",
                      image_folder="train_pbr")
        settings["copy_meshes"] = False
        generate_data(lm_path, os.path.join(out_path, "lm"), settings, model_folder="models_eval",
                      image_folder="val_pbr")
    if args.gen_hb:
        settings.update({"filetype_in": "png", "copy_meshes": True, "far": 2500})
        generate_data(hb_path, os.path.join(out_path, "hb"), settings, model_folder="models_eval",
                      image_folder="test_primesense")
        settings.update({"width": 1920, "height": 1080, "copy_meshes": False})
        generate_data(hb_path, os.path.join(out_path, "hb"), settings, model_folder="models_eval",
                      image_folder="test_kinect")


if __name__ == "__main__":
    main()
