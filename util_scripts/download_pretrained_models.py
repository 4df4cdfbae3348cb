#!/usr/bin/env python
"""Fetch the reference pretrained weights (result_w_8.h5 / result_w_13.h5).

These Keras h5 exports can be imported directly via
``casapose_tpu.core.checkpoint.import_keras_h5`` (or ``--load_h5_weights 1``
on the CLI). Convert once to .npz with util_scripts/convert_h5_weights.py
for faster loading.
"""

import os
import urllib.request

URLS = [
    "https://cvg.hhi.fraunhofer.de/CASAPose/result_w_8.h5",
    "https://cvg.hhi.fraunhofer.de/CASAPose/result_w_13.h5",
]


def main(out_dir="data/pretrained_models"):
    os.makedirs(out_dir, exist_ok=True)
    failed = []
    for url in URLS:
        fname = os.path.join(out_dir, os.path.basename(url))
        if os.path.exists(fname):
            print(f"exists: {fname}")
            continue
        print(f"downloading {url}")
        tmp = fname + ".download"
        try:
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, fname)
        except OSError as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            print(f"FAILED ({e}); if this machine is offline, fetch the file manually and place it at {fname}")
            failed.append(url)
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
