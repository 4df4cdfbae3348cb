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
