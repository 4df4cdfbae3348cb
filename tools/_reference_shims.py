"""Dependency shims for running the reference TF implementation here.

Shared by tf_reference_oracle.py / run_reference_eval.py /
benchmarks/baseline_reference.py. None of these modify the reference tree:

  * ``TF_USE_LEGACY_KERAS=1`` — the reference targets TF2.9/Keras 2.
  * tensorflow_addons stub — ``image.transform`` via the core op the real
    tfa wraps (ImageProjectiveTransformV3), ``image.connected_components``
    via scipy.ndimage.label (same 4-connectivity).
  * trimesh stub — ``load(path).vertices`` / ``.bounding_box.vertices``
    from a tiny ASCII-PLY reader (enough for the synthetic parity scenes).
  * imgaug stub — attribute-chain dummy (augmentation_model.py builds
    pipelines at import; the parity paths never execute them).
  * numpy 2 'unicode_' dtype alias (vectorfield_dataset.py:493).
"""

import os
import sys
import types


def setup_reference_env():
    """Full environment prep; returns the reference tree path."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
    ref = os.environ.get("CASAPOSE_REFERENCE_DIR", "/root/reference")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    stub_tfa()
    stub_trimesh()
    stub_imgaug()
    patch_tf_internals()
    import numpy as np

    if "unicode_" not in np.sctypeDict:
        np.sctypeDict["unicode_"] = np.str_
    return ref


def stub_tfa():
    import numpy as np
    import tensorflow as tf

    tfa = types.ModuleType("tensorflow_addons")
    image = types.ModuleType("tensorflow_addons.image")

    def transform(images, transforms, interpolation="nearest", output_shape=None, fill_value=0.0):
        if output_shape is None:
            output_shape = tf.shape(images)[1:3]
        transforms = tf.convert_to_tensor(transforms, tf.float32)
        if transforms.shape.ndims == 1:
            transforms = transforms[None]
        return tf.raw_ops.ImageProjectiveTransformV3(
            images=images,
            transforms=transforms,
            output_shape=output_shape,
            fill_value=fill_value,
            interpolation=interpolation.upper(),
        )

    def connected_components(images):
        from scipy import ndimage

        def _cc(arr):
            arr = np.asarray(arr)
            single = arr.ndim == 2
            if single:
                arr = arr[None]
            out = np.zeros(arr.shape, np.int32)
            offset = 0
            for i in range(arr.shape[0]):
                lab, n = ndimage.label(arr[i] != 0)  # 4-connectivity, like tfa
                lab = lab.astype(np.int32)
                lab[lab > 0] += offset
                out[i] = lab
                offset += n
            return out[0] if single else out

        return tf.numpy_function(_cc, [images], tf.int32)

    image.transform = transform
    image.connected_components = connected_components
    tfa.image = image
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.image"] = image


def patch_tf_internals():
    """Restore TF-internal symbols the reference uses that modern TF removed.

    ``ExponentialDecayLateStart.__call__`` (learning_rate_schedules.py:27)
    calls ``ops.convert_to_tensor_v2_with_dispatch``, gone from current TF;
    ``tf.convert_to_tensor`` is its public equivalent.
    """
    from tensorflow import convert_to_tensor
    from tensorflow.python.framework import ops

    if not hasattr(ops, "convert_to_tensor_v2_with_dispatch"):
        ops.convert_to_tensor_v2_with_dispatch = convert_to_tensor


def stub_trimesh():
    import numpy as np

    trimesh = types.ModuleType("trimesh")

    class _Box:
        def __init__(self, verts):
            lo, hi = verts.min(0), verts.max(0)
            corners = [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])]
            self.vertices = np.asarray(corners, np.float64)

    class _Mesh:
        def __init__(self, verts):
            self.vertices = verts
            self.bounding_box = _Box(verts)

    def load(path, **kwargs):
        verts = []
        with open(path, "r") as f:
            n = 0
            for line in f:
                line = line.strip()
                if line.startswith("element vertex"):
                    n = int(line.split()[-1])
                if line == "end_header":
                    break
            for _ in range(n):
                verts.append([float(v) for v in f.readline().split()[:3]])
        return _Mesh(np.asarray(verts, np.float64))

    trimesh.load = load
    sys.modules["trimesh"] = trimesh


def stub_imgaug():
    class _Chain:
        """Callable/attribute sink: iaa.X(...)(...) etc. all resolve.

        ``seq(images=batch)`` returns the batch unchanged — the identity
        augmentation. This makes ``use_imgaug=1`` reference runs
        deterministic, which is what the cross-framework TRAIN parity
        harness relies on (both sides run with augmentation disabled).
        """

        def __call__(self, *a, **k):
            if "images" in k:
                import numpy as np

                return np.asarray(k["images"])
            return self

        def __getattr__(self, name):
            return self

    imgaug = types.ModuleType("imgaug")
    augmenters = types.ModuleType("imgaug.augmenters")
    chain = _Chain()
    augmenters.__getattr__ = lambda name: chain  # module-level getattr (py3.7+)
    imgaug.augmenters = augmenters
    imgaug.__getattr__ = lambda name: chain
    sys.modules["imgaug"] = imgaug
    sys.modules["imgaug.augmenters"] = augmenters
