"""TRUE multi-process multi-host data-parallel training (SURVEY §5.8).

The DP-invariance test proves 1-device == 8-device on one process; this
test proves the MULTI-PROCESS feeding path: two ``jax.distributed``
processes (4 virtual CPU devices each, gloo collectives), each holding
only its LOCAL half of the global batch, must reproduce the single-process
8-device step bit-for-roundoff — losses AND updated parameters. A
rank-dependent slicing bug in ``shard_batch``'s
``make_array_from_process_local_data`` path (parallel/mesh.py) would pass
the forced-single-process test but fail here (VERDICT r3 weak #6 / item 6).

The subprocess driver runs the identical
``build_synthetic_train_case`` + ``adam_tf`` step as the DP-invariance
test and the multichip dryrun.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import os, sys, json
port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid)
sys.path.insert(0, "@@REPO@@")
# NOTE: deliberately NOT sharing the suite's .jax_cache here — a cached
# single-process executable resolving under the 2-process runtime produced
# array-fetch failures; the driver pays its own compile instead.
import numpy as np
import jax.numpy as jnp
from __graft_entry__ import build_synthetic_train_case
from casapose_tpu.core.optimizer import adam_tf
from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
from casapose_tpu.train import TrainState, build_train_step

assert jax.process_count() == 2 and len(jax.devices()) == 8
model, variables, cfg, lw, batch = build_synthetic_train_case(b=8, noise=0.0)
mesh = make_mesh(n_data=8)
tx = adam_tf(1e-3)
params = shard_params(mesh, variables["params"])
batch_stats = shard_params(mesh, variables.get("batch_stats", {}))
state = TrainState(params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), step=jnp.zeros([], jnp.int32))
step = build_train_step(model, tx, cfg, lw)
# THE multihost contract: this process feeds only its local half of the
# global batch; shard_batch assembles the global arrays.
local = {k: np.asarray(v)[pid * 4:(pid + 1) * 4] for k, v in batch.items()}
dev_batch = shard_batch(mesh, local)
state, losses = step(state, dev_batch, jax.random.PRNGKey(5))
losses = np.asarray(losses)
flat = jax.tree_util.tree_leaves_with_path(jax.device_get(state.params))
checks = {jax.tree_util.keystr(p): [float(np.abs(a).sum()), float(np.asarray(a).ravel()[:3].sum())]
          for p, a in flat}
stats_sum = float(sum(np.abs(np.asarray(a)).sum()
                      for a in jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))))
with open(out_path, "w") as f:
    json.dump({"losses": losses.tolist(), "checks": checks, "stats_sum": stats_sum}, f)
print("proc", pid, "done", losses.tolist())
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    import jax

    # ---- reference: single-process 8-device step on the test's own mesh
    import jax.numpy as jnp

    from __graft_entry__ import build_synthetic_train_case
    from casapose_tpu.core.optimizer import adam_tf
    from casapose_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from casapose_tpu.train import TrainState, build_train_step

    assert len(jax.devices()) >= 8
    model, variables, cfg, lw, batch = build_synthetic_train_case(b=8, noise=0.0)
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    tx = adam_tf(1e-3)
    params = shard_params(mesh, variables["params"])
    batch_stats = shard_params(mesh, variables.get("batch_stats", {}))
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params), step=jnp.zeros([], jnp.int32)
    )
    step = build_train_step(model, tx, cfg, lw)
    state, ref_losses = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(5))
    ref_losses = np.asarray(ref_losses)
    ref_params = jax.device_get(state.params)
    ref_checks = {
        jax.tree_util.keystr(p): (float(np.abs(a).sum()), float(np.asarray(a).ravel()[:3].sum()))
        for p, a in jax.tree_util.tree_leaves_with_path(ref_params)
    }
    ref_stats_sum = float(
        sum(np.abs(np.asarray(a)).sum() for a in jax.tree_util.tree_leaves(jax.device_get(state.batch_stats)))
    )

    # ---- the two-process run
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER.replace("@@REPO@@", REPO))
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(port), str(i), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost driver timed out")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"process {i} failed:\n{logs[i][-3000:]}"

    results = [json.load(open(o)) for o in outs]
    # both processes see the identical (replicated) result
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=0, atol=0)
    # and it matches the single-process step to collective roundoff
    for r in results:
        np.testing.assert_allclose(r["losses"], ref_losses, rtol=3e-4, atol=3e-5)
        assert r["stats_sum"] == pytest.approx(ref_stats_sum, rel=1e-4)
        for key, (abs_sum, head) in ref_checks.items():
            got = r["checks"][key]
            # Adam normalizes steps to ~lr: cross-process (gloo) reduction
            # order vs single-process XLA flips isolated near-zero-gradient
            # entries by up to ~2*lr (the DP-invariance test bounds this
            # per-element); a missing/wrong collective displaces whole
            # tensors by ~lr * n_elements, far outside these bands.
            assert got[0] == pytest.approx(abs_sum, rel=1e-3, abs=1e-3), (
                f"{key} abs-sum: {got[0]} vs {abs_sum}"
            )
            assert got[1] == pytest.approx(head, rel=1e-3, abs=5e-3), f"{key} head: {got[1]} vs {head}"
