"""Remat (jax.checkpoint) must not change the train step's math.

``StepConfig.remat`` wraps the network forward in ``jax.checkpoint`` so
the backward pass recomputes activations instead of storing them — a pure
memory/compute trade. One step from identical state must produce the same
losses and updated parameters either way.
"""

import jax
import numpy as np
import optax

from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from casapose_tpu.train import TrainState, build_train_step


def _one_step(remat: bool):
    import dataclasses

    from __graft_entry__ import build_synthetic_train_case

    model, variables, cfg, lw, batch = build_synthetic_train_case(b=4, h=32, w=32, noise=0.0)
    cfg = dataclasses.replace(cfg, remat=remat)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    tx = optax.adam(1e-3)
    state = TrainState(
        params=shard_params(mesh, variables["params"]),
        batch_stats=shard_params(mesh, variables.get("batch_stats", {})),
        opt_state=tx.init(shard_params(mesh, variables["params"])),
        step=np.zeros([], np.int32),
    )
    step = build_train_step(model, tx, cfg, lw)
    state, losses = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    return np.asarray(losses), jax.device_get(state.params)


def test_remat_step_equivalence():
    losses_a, params_a = _one_step(remat=False)
    losses_b, params_b = _one_step(remat=True)
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_b))
    assert flat_a, "empty params"
    for path, leaf_a in flat_a:
        np.testing.assert_allclose(
            leaf_a, flat_b[path], rtol=1e-5, atol=1e-6, err_msg=f"param diverges under remat: {path}"
        )
