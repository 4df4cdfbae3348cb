"""Training-dynamics smoke test: the full train step LEARNS.

Parity tests pin every loss/gradient formula against the reference; this
test checks the property those formulas exist for — that repeatedly
applying ``build_train_step`` (forward, LS voting, keypoint-reprojection
loss, composite loss, grads, Adam, BN moving stats) to one fixed batch
drives the loss down substantially. A sign error in any gradient path, a
mis-wired optimizer, or broken BN-stat threading would all fail this even
while individual unit tests pass. (The reference has no such test; its
training health is only observable via full-dataset runs,
train_casapose.py:494-691.)

Runs the identical synthetic case as the DP-invariance test / multichip
dryrun (same jit program -> shared compile cache).
"""

import jax
import numpy as np
import pytest

from casapose_tpu.core.optimizer import adam_tf
from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from casapose_tpu.train import TrainState, build_train_step


@pytest.mark.slow
def test_overfit_single_batch_reduces_loss():
    from __graft_entry__ import build_synthetic_train_case

    model, variables, cfg, lw, batch = build_synthetic_train_case(b=8, noise=0.0)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    # the shipped production optimizer (train.py::run_training uses adam_tf)
    tx = adam_tf(1e-3)
    params = shard_params(mesh, variables["params"])
    batch_stats = shard_params(mesh, variables.get("batch_stats", {}))
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=np.zeros([], np.int32),
    )
    step = build_train_step(model, tx, cfg, lw)
    dev_batch = shard_batch(mesh, batch)
    rng = jax.random.PRNGKey(0)

    first = None
    losses = None
    for i in range(60):
        state, losses = step(state, dev_batch, rng)
        if i == 0:
            first = np.asarray(losses)
            assert np.all(np.isfinite(first)), f"non-finite initial losses: {first}"
    final = np.asarray(losses)
    assert np.all(np.isfinite(final)), f"non-finite final losses: {final}"
    # losses[0] is the weighted total; mask/vertex/proxy components follow.
    assert final[0] < 0.5 * first[0], (
        f"train step failed to overfit a fixed batch: total loss {first[0]:.4f} -> {final[0]:.4f} "
        f"(components first={first}, final={final})"
    )
    # The segmentation component must itself train (not just the total
    # riding on one easy term).
    assert final[1] < 0.8 * first[1], f"mask loss did not improve: {first[1]:.4f} -> {final[1]:.4f}"
