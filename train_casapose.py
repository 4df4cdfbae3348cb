#!/usr/bin/env python
"""Train CASAPose (TPU-native).

Usage mirrors the reference train script:
    python train_casapose.py -c configs/config_8.ini --data ... --datatest ... --datameshes ...
"""

from casapose_tpu.train import run_training
from casapose_tpu.utils.config import parse_config


def main():
    opt = parse_config()
    run_training(opt)


if __name__ == "__main__":
    main()
