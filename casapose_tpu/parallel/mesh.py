"""Device mesh + sharding helpers (the distributed backend).

The reference's only parallelism is single-host data parallelism via
``tf.distribute.MirroredStrategy`` with NCCL all-reduce and
SyncBatchNormalization (train_casapose.py:195; SURVEY §2.9/§5.8). The
TPU-native equivalent is declarative: build a ``jax.sharding.Mesh`` with a
``data`` axis (plus a ``model`` axis reserved for future tensor sharding),
annotate the batch as sharded over ``data`` and the params as replicated,
and jit the train step — XLA inserts the ICI collectives:

  * gradient mean  <- psum from the sharded-batch loss reduction
    (replaces NCCL all-reduce on mirrored variables);
  * cross-replica BatchNorm moments <- global-batch mean/var reductions
    (replaces SyncBatchNormalization);
  * metric sums    <- the same global reductions (replaces
    ``strategy.reduce(MEAN/SUM)``).

Multi-slice scaling over DCN only changes mesh construction (device order),
not the step function.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``batch_size`` given, the data axis is clamped to the largest
    device count that divides the batch (a batch of 2 cannot shard over 8
    devices).
    """
    import math

    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if batch_size is not None:
        n_data = math.gcd(n_data, batch_size)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] image sharding: batch over ``data``, height over ``model``.

    Spatial partitioning for latency-critical inference: sharding H over the
    ``model`` axis splits every conv's spatial work across chips and GSPMD
    inserts the halo exchanges (border-row ppermutes) and the psum that
    completes the voting contraction — the model code is unchanged. An
    N-chip mesh then accelerates a SINGLE image's latency, which pure data
    parallelism cannot (the reference has no counterpart; its only
    parallelism is batch-wise MirroredStrategy, train_casapose.py:195).
    Equivalence vs the unsharded forward is pinned by
    tests/test_mesh.py::test_spatial_inference_equivalence.
    """
    return NamedSharding(mesh, P("data", "model"))


def shard_batch(mesh: Mesh, batch, multihost: Optional[bool] = None):
    """Place a pytree of host arrays with batch-dim sharding over ``data``.

    Single-host: a plain ``device_put`` with the sharded layout. Multi-host
    (``jax.process_count() > 1``, SURVEY §5.8): each process passes only its
    LOCAL slice of the global batch (global batch = local batch x process
    count, loaders seeded per process) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — no host gathers, each
    host feeds exactly the devices it owns. ``multihost`` forces the path
    (used by tests; on one process both paths must agree).
    """
    sh = batch_sharding(mesh)
    if multihost is None:
        multihost = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        if x.dtype.kind in ("U", "S", "O"):  # strings stay host-side
            return x
        if multihost:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def shard_params(mesh: Mesh, params, multihost: Optional[bool] = None):
    """Replicate a parameter pytree across the mesh.

    Multi-host: ``device_put`` cannot address other hosts' devices, so the
    replicated global array is assembled from each process's (identical)
    full copy via ``make_array_from_process_local_data`` — for a fully
    replicated spec the process-local data IS the whole array.
    """
    sh = replicated(mesh)
    if multihost is None:
        multihost = jax.process_count() > 1

    def put(x):
        if multihost:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, params)
