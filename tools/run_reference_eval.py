#!/usr/bin/env python
"""Run the REFERENCE ``test_casapose.py`` evaluation harness in this
environment, for end-to-end cross-framework metric comparison.

The reference targets TF2.9 + tensorflow-addons + trimesh + imgaug; none of
the last three are installed here. This wrapper supplies minimal shims (the
reference tree itself is never modified):

  * legacy Keras (``TF_USE_LEGACY_KERAS=1``);
  * tensorflow_addons: ``image.transform`` -> the core TF op tfa wraps
    (ImageProjectiveTransformV3); ``image.connected_components`` ->
    scipy.ndimage.label (same 4-connectivity);
  * trimesh: ``load(path).vertices`` / ``.bounding_box.vertices`` backed by
    a tiny ASCII-PLY reader (enough for the synthetic parity scenes);
  * imgaug: attribute-chain dummy (the eval path never executes
    augmentation, but augmentation_model.py builds pipelines at import).

Usage: python tools/run_reference_eval.py [reference test_casapose.py flags]
"""

import os
import runpy
import sys

# Backwards-compatible re-exports (benchmarks/baseline_reference.py and ad-hoc
# dump scripts import the stubs from this module).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _reference_shims import stub_imgaug as _stub_imgaug  # noqa: E402,F401
from _reference_shims import stub_tfa as _stub_tfa  # noqa: E402,F401
from _reference_shims import stub_trimesh as _stub_trimesh  # noqa: E402,F401


def main():
    if os.path.dirname(os.path.abspath(__file__)) not in sys.path:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _reference_shims import setup_reference_env

    ref = setup_reference_env()

    # The reference hard-codes weights="imagenet" (test_casapose.py:217),
    # which triggers a download (weights.py:26-31) — impossible without
    # network. For parity runs the full model h5 is loaded right after
    # (by_name, skip_mismatch; test_casapose.py:225-228), so the backbone
    # init is irrelevant; honor $CASAPOSE_IMAGENET_H5 if provided, else skip.
    import casapose.pose_models.models.resnet as ref_resnet

    def _local_load_model_weights(model, model_name, dataset, classes, include_top, **kwargs):
        local = os.environ.get("CASAPOSE_IMAGENET_H5")
        if local and os.path.exists(local):
            model.load_weights(local, by_name=True, skip_mismatch=True)
        else:
            print(f"[run_reference_eval] skipping {dataset} backbone init (no network/local file)")

    ref_resnet.load_model_weights = _local_load_model_weights

    script = os.path.join(ref, "test_casapose.py")
    sys.argv = [script] + sys.argv[1:]
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
