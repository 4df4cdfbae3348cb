"""Serving export (jax.export): serialized artifact equals the live pipeline.

The exported StableHLO program (network -> LS voting -> PnP, weights as
constants) must reproduce the in-framework inference exactly — the
artifact is what a serving host runs WITHOUT this codebase
(casapose_tpu/core/export.py).
"""

import numpy as np

import jax


def test_export_round_trip(tmp_path):
    from functools import partial

    import jax.numpy as jnp

    from casapose_tpu.core.export import build_serving_fn, export_inference, load_exported
    from casapose_tpu.models.registry import get_model

    no_objects, k = 2, 9
    b, h, w = 1, 64, 64
    model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=1 + no_objects)
    img0 = jnp.zeros((b, h, w, 3), jnp.float32)
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img0)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(b, h, w, 3)).astype(np.float32)
    kp3d = rng.uniform(-0.05, 0.05, (b, no_objects, 1, k, 3)).astype(np.float32)
    camera = np.tile(np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32), (b, 1, 1))

    blob = export_inference(model, variables, b, h, w, no_objects, k, platforms=["cpu"])
    assert len(blob) > 1_000_000  # weights folded in (21M-param backbone)

    # Round-trip through disk, as a serving host would.
    path = tmp_path / "artifact.stablehlo"
    path.write_bytes(blob)
    exported = load_exported(path.read_bytes())
    got = np.asarray(exported.call(img, kp3d, camera))

    fn = build_serving_fn(model, variables, no_objects, k)
    want = np.asarray(jax.jit(fn)(img, kp3d, camera))

    assert got.shape == (b, no_objects, 1, 3, 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
