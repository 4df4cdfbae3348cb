#!/usr/bin/env python
"""Evaluate CASAPose (TPU-native): ADD(-S)/2D metrics, losses, timing.

Usage mirrors the reference test script:
    python test_casapose.py -c configs/config_8.ini --load_h5_weights 1 \
        --load_h5_filename .../result_w_8 --datatest ... --datameshes ... \
        --train_vectors_with_ground_truth 0
"""

from casapose_tpu.eval import run_evaluation
from casapose_tpu.utils.config import parse_config


def main():
    opt = parse_config()
    run_evaluation(opt)


if __name__ == "__main__":
    main()
