#!/usr/bin/env python
"""Convert reference Keras h5 weights to this framework's .npz format.

Usage:
    python util_scripts/convert_h5_weights.py result_w_8.h5 result_w_8.npz \
        --objects 8 [--no_points 9] [--modelname casapose_c_gcu5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("h5_in")
    parser.add_argument("npz_out")
    parser.add_argument("--objects", type=int, required=True)
    parser.add_argument("--no_points", type=int, default=9)
    parser.add_argument("--modelname", default="casapose_c_gcu5")
    parser.add_argument("--estimate_confidence", type=int, default=1)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from casapose_tpu.core.checkpoint import import_keras_h5, save_weights_npz
    from casapose_tpu.models.registry import get_model

    ver_dim = args.no_points * 2 + (args.no_points if args.estimate_confidence else 0)
    model = get_model(args.modelname, ver_dim=ver_dim, seg_dim=1 + args.objects)
    img = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    variables = dict(variables)
    variables, loaded, skipped = import_keras_h5(args.h5_in, variables, verbose=True)
    print(f"loaded {loaded} arrays; {len(skipped)} h5 datasets had no matching parameter")
    save_weights_npz(args.npz_out, variables)
    print(f"wrote {args.npz_out}")


if __name__ == "__main__":
    main()
