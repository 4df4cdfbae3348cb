"""Serving export: the inference pipeline as a portable StableHLO artifact.

``jax.export`` serializes a lowered jit function — here the full flagship
inference step (network forward -> connected-component-filtered LS voting
-> on-device EPnP+LM pose solve, the same program ``bench.py`` and
``util_scripts/test_minimal.py`` time) with the weights folded in as
constants. A serving host loads the artifact with
``jax.export.deserialize(blob).call(img, keypoints3d, camera)`` — it needs
jax, not this framework, and lowering is cross-platform (export for
``tpu`` from a CPU-only host).

The reference has no serving-export story (its deployment unit is the
full TF2 repo plus cv2/tfa host dependencies inside the graph —
reference test_casapose.py:203-236); this is a TPU-first addition.

CLI: ``util_scripts/export_model.py`` (flags: ``--export_path``,
``--export_platforms`` plus the usual model/weights flags).
"""

import jax
import jax.numpy as jnp


def build_serving_fn(model, variables, no_objects, no_points, estimate_confidence=True,
                     filter_estimates=True, choose_second=False, cc_downsample=4):
    """The deployable inference program: (img, keypoints3d, camera) -> poses.

    Weights are closed over (folded as constants at export). Mirrors the
    eval harness's voting wiring (casapose_tpu/eval.py::build_test_step).
    """
    seg_dim = 1 + no_objects
    k = no_points

    def fn(img, keypoints3d, camera):
        out = model.apply(variables, img, train=False)
        seg = out[..., :seg_dim]
        dirs = out[..., seg_dim : seg_dim + 2 * k]
        conf = out[..., seg_dim + 2 * k :] if estimate_confidence else jnp.ones(
            img.shape[:3] + (k,), out.dtype
        )
        from casapose_tpu.ops.voting import ls_voting
        from casapose_tpu.pose.evaluation import poses_pnp

        coords = ls_voting(
            seg, dirs, conf, num_points=k,
            filter_estimates=filter_estimates,
            output_second_largest_component=choose_second,
            cc_downsample=cc_downsample,
            # Fused Pallas voting layout is [seg | dirs | conf] — only valid
            # when confidence is estimated (mirrors eval.py::build_test_step).
            raw_output=out if estimate_confidence else None,
        )
        return poses_pnp(coords, seg, keypoints3d, camera, no_objects)

    return fn


def export_inference(model, variables, batch, height, width, no_objects, no_points,
                     platforms=("tpu",), **serving_kwargs):
    """Serialize the inference pipeline; returns ``bytes``.

    Static shapes by design (TPU-first: no dynamic dims on the serving
    path); export one artifact per (batch, resolution) deployment shape.
    """
    fn = build_serving_fn(model, variables, no_objects, no_points, **serving_kwargs)
    args = (
        jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, no_objects, 1, no_points, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 3, 3), jnp.float32),
    )
    exported = jax.export.export(jax.jit(fn), platforms=list(platforms))(*args)
    return exported.serialize()


def load_exported(blob):
    """Deserialize an artifact; ``.call(img, keypoints3d, camera)`` runs it."""
    return jax.export.deserialize(bytearray(blob))
