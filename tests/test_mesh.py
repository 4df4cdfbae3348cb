"""Mesh/sharding helpers, incl. the multi-host feed path (SURVEY §5.8).

The reference's distribution is single-host MirroredStrategy only
(reference train_casapose.py:195); multi-host is a TPU-pod concern with no
reference counterpart. Our contract: on ``jax.process_count() == 1`` the
``multihost=True`` branch of ``shard_batch`` (assembly via
``jax.make_array_from_process_local_data``) must be bit-identical to the
default ``device_put`` branch — the property that lets the same train loop
run unchanged on a pod, each process feeding its local slice.
"""

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)


def _batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "img": rng.standard_normal((b, 16, 24, 3)).astype(np.float32),
        "seg": rng.integers(0, 3, size=(b, 16, 24)).astype(np.int32),
        "name": np.asarray([f"im_{i}" for i in range(b)]),  # stays host-side
    }


def test_make_mesh_clamps_to_batch():
    mesh = make_mesh(batch_size=2, devices=jax.devices())
    assert mesh.shape["data"] == 2
    mesh = make_mesh(batch_size=8, devices=jax.devices())
    assert mesh.shape["data"] == 8


def test_shard_batch_multihost_equals_device_put():
    assert jax.process_count() == 1
    mesh = make_mesh(n_data=8)
    plain = shard_batch(mesh, _batch())
    multi = shard_batch(mesh, _batch(), multihost=True)

    for key in ("img", "seg"):
        a, b = plain[key], multi[key]
        assert a.sharding == b.sharding == batch_sharding(mesh)
        # per-shard layout identical: each device holds batch/8 rows
        assert a.addressable_shards[0].data.shape[0] == a.shape[0] // 8
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # strings must bypass the device on both paths
    assert isinstance(multi["name"], np.ndarray) and multi["name"].dtype.kind == "U"

    # and the multihost-assembled arrays must execute under jit on the mesh
    out = jax.jit(lambda x: jnp.sum(x["img"] * x["seg"][..., None]))(
        {"img": multi["img"], "seg": multi["seg"]}
    )
    ref = np.sum(_batch()["img"] * _batch()["seg"][..., None])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_shard_params_replicates():
    mesh = make_mesh(n_data=8)
    params = {"w": np.ones((4, 4), np.float32)}
    sharded = shard_params(mesh, params)
    assert sharded["w"].sharding.is_fully_replicated


def test_spatial_inference_equivalence():
    """Height-sharded (spatial-partitioned) inference == unsharded inference.

    Runs the flagship forward + LS voting on a 1x8 (data, model) mesh with
    the image sharded P('data', 'model') — GSPMD supplies the conv halo
    exchanges and completes the voting einsum with a psum over the model
    axis. The result must match the single-device forward to f32 roundoff;
    this is the latency-scaling mode ``spatial_sharding`` documents.
    """
    from functools import partial

    from casapose_tpu.models.registry import get_model
    from casapose_tpu.ops.voting import ls_voting
    from casapose_tpu.parallel.mesh import spatial_sharding

    no_objects, k = 2, 3
    seg_dim = 1 + no_objects
    model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=seg_dim)
    h = w = 64
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), img)

    def fn(variables, img):
        out = model.apply(variables, img, train=False)
        seg = out[..., :seg_dim]
        dirs = out[..., seg_dim : seg_dim + 2 * k]
        conf = out[..., seg_dim + 2 * k :]
        return out, ls_voting(seg, dirs, conf, num_points=k, filter_estimates=False)

    ref_out, ref_pts = jax.jit(fn)(variables, img)

    mesh = make_mesh(n_data=1, n_model=8)
    sp = spatial_sharding(mesh)
    img_sp = jax.device_put(img, sp)
    var_sp = shard_params(mesh, variables)
    out, pts = jax.jit(fn)(var_sp, img_sp)  # shardings inferred from inputs
    assert not out.sharding.is_fully_replicated  # work actually distributed
    # Tolerance: GSPMD retiles every conv reduction, so f32 accumulation
    # order differs (measured max|diff| ~5e-4 on activations spanning ~[-47,47]).
    # A halo-exchange bug would produce O(1) errors at partition seams, far
    # outside these bands.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(ref_pts), rtol=1e-3, atol=5e-3)
