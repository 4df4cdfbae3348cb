#!/usr/bin/env python
"""Export the inference pipeline as a deployable StableHLO artifact.

Serializes network forward -> LS voting -> on-device PnP (the program
bench.py times) with the weights folded in as constants, via jax.export.
A serving host runs it with jax alone — none of this framework's code or
data dependencies (see casapose_tpu/core/export.py).

Usage (same model/weights flags as test_casapose.py):

    python util_scripts/export_model.py -c configs/config_8.ini \
        --load_h5_weights 1 --load_h5_filename path/to/result_w_8 \
        --imagesize_test 480 640 --batchsize_test 16 \
        --export_path serving/casapose_480x640_b16.stablehlo \
        --export_platforms tpu,cpu

Smoke-load:

    import jax.export
    exp = jax.export.deserialize(bytearray(open(PATH, 'rb').read()))
    poses = exp.call(img, keypoints3d, camera)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from casapose_tpu.core.cache import setup_compilation_cache
    from casapose_tpu.utils.config import parse_config

    opt = parse_config(argv)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    setup_compilation_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not opt.export_path:
        raise SystemExit("--export_path is required")

    from casapose_tpu.core.checkpoint import import_keras_h5, load_weights_npz
    from casapose_tpu.core.export import export_inference
    from casapose_tpu.train import build_model_from_opt, init_model

    objects = [o for o in (opt.object or "").split(",") if o]
    no_objects = len(objects)
    if not no_objects:
        raise SystemExit("--object must list the objects of interest")
    model = build_model_from_opt(opt, no_objects)
    variables = init_model(model, opt.imagesize_test, False, seed=opt.manualseed)

    if opt.load_h5_weights:
        fname = opt.load_h5_filename
        for c in (fname + ".npz", fname + ".h5"):
            if os.path.exists(c):
                loader = load_weights_npz if c.endswith(".npz") else import_keras_h5
                variables, n, _ = loader(c, variables)
                print(f"loaded {n} arrays from {c}")
                break
        else:
            raise SystemExit(f"no weights at {fname}.npz / {fname}.h5")

    h, w = opt.imagesize_test
    batch = max(int(getattr(opt, "batchsize_test", 1)), 1)
    platforms = [p for p in opt.export_platforms.split(",") if p]
    blob = export_inference(
        model, variables, batch, int(h), int(w), no_objects, opt.no_points,
        platforms=platforms,
        estimate_confidence=bool(opt.estimate_confidence),
        filter_estimates=bool(opt.confidence_filter_estimates),
        choose_second=bool(opt.confidence_choose_second),
        cc_downsample=int(getattr(opt, "cc_filter_downsample", 4)),
    )
    os.makedirs(os.path.dirname(os.path.abspath(opt.export_path)), exist_ok=True)
    with open(opt.export_path, "wb") as f:
        f.write(blob)
    print(
        f"wrote {opt.export_path}: {len(blob)/1e6:.1f} MB, platforms={platforms}, "
        f"input ({batch},{h},{w},3) -> poses ({batch},{no_objects},1,3,4)"
    )


if __name__ == "__main__":
    main()
