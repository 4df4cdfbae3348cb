"""Keras-h5 WRITER parity: export must replicate reference ``save_weights``.

The reference ecosystem's portable artifact is the Keras h5 the training
loop writes every saveinterval (reference train_casapose.py:903) and every
consumer loads with ``load_weights(by_name=True, skip_mismatch=True)``
(test_casapose.py:228, train_casapose.py:374-378). ``export_keras_h5``
must therefore reproduce, for every layer kind, exactly what Keras itself
writes: the group set, each group's ``weight_names`` attribute ORDER (Keras
assigns by order within a matched group), and the dataset layouts
(PartialConvolution (ch,3,3,dim) transpose included).

Strategy: take a reference-produced ``weights.h5`` oracle fixture, import
it (already pinned lossless by tests/test_tf_parity.py), re-export, and
compare file-to-file. This is a bit-level writer test needing no TF in
process. The end-to-end proof — OUR trained weights evaluated by the
REFERENCE harness — is tests/test_reference_e2e.py::test_trained_h5_round_trip.
"""

import json
import os
import sys
from functools import partial

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
from oracle_cache import ensure_fixtures, oracle_skip  # noqa: E402

pytestmark = pytest.mark.slow

# One representative per h5 layer-layout family:
#   flagship (non-shared PartialConvolution -> _prepare groups),
#   shared conv (pv_block_X_Y groups), trainable HalfSize (inner conv2d),
#   single-decoder pvnet (fused final conv).
VARIANTS = ["casapose_c_gcu5", "casapose_c_gcu4_sw1", "casapose_c", "pvnet_combined"]


def _fwd_argv(model):
    return [
        "forward", "--model", model,
        "--height", "64", "--width", "64",
        "--objects", "4", "--points", "9",
    ]


@pytest.fixture(scope="session")
def fixtures():
    try:
        dirs = ensure_fixtures([_fwd_argv(m) for m in VARIANTS])
    except RuntimeError as e:
        oracle_skip(e)
    return dict(zip(VARIANTS, dirs))


def _h5_layout(path):
    """{group: [(weight_name, shape), ...]} for weight-bearing groups."""
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for name in f.attrs["layer_names"]:
            name = name.decode() if isinstance(name, bytes) else name
            g = f[name]
            wn = [w.decode() if isinstance(w, bytes) else w for w in g.attrs.get("weight_names", [])]
            if wn:
                out[name] = [(w, np.asarray(g[w])) for w in wn]
    return out


@pytest.mark.parametrize("variant", VARIANTS)
def test_export_replicates_reference_save_weights(fixtures, variant, tmp_path):
    import jax

    from casapose_tpu.core.checkpoint import export_keras_h5, import_keras_h5
    from casapose_tpu.models.registry import get_model

    out = fixtures[variant]
    meta = json.load(open(os.path.join(out, "meta.json")))
    ref_h5 = os.path.join(out, "weights.h5")
    ref_layout = _h5_layout(ref_h5)
    backbone_group = next(n for n in ref_layout if n.startswith("model"))

    model = get_model(meta["model"], ver_dim=meta["ver_dim"], seg_dim=meta["seg_dim"])
    x = np.zeros((1, meta["height"], meta["width"], 3), np.float32)
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), x)
    variables, loaded, skipped = import_keras_h5(ref_h5, variables)
    assert skipped == [] and loaded == meta["n_weights"]

    our_h5 = str(tmp_path / "exported.h5")
    export_keras_h5(our_h5, variables, model=model, backbone_name=backbone_group)
    our_layout = _h5_layout(our_h5)

    assert set(our_layout) == set(ref_layout), (
        f"group set mismatch:\n only-ours: {sorted(set(our_layout) - set(ref_layout))}"
        f"\n only-ref: {sorted(set(ref_layout) - set(our_layout))}"
    )
    for gname, ref_weights in ref_layout.items():
        our_weights = our_layout[gname]
        assert [w for w, _ in our_weights] == [w for w, _ in ref_weights], (
            f"weight_names order mismatch in {gname}:\n ours: {[w for w, _ in our_weights]}"
            f"\n ref:  {[w for w, _ in ref_weights]}"
        )
        for (wname, ours), (_, ref) in zip(our_weights, ref_weights):
            assert ours.shape == ref.shape, f"{gname}/{wname}: {ours.shape} vs {ref.shape}"
            np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6, err_msg=f"{gname}/{wname}")


def test_export_import_round_trip(fixtures, tmp_path):
    """export -> import into fresh variables reproduces every array exactly
    (zero skips both ways)."""
    import jax

    from casapose_tpu.core.checkpoint import (
        export_keras_h5,
        flatten_params,
        import_keras_h5,
    )
    from casapose_tpu.models.registry import get_model

    out = fixtures["casapose_c_gcu5"]
    meta = json.load(open(os.path.join(out, "meta.json")))
    model = get_model(meta["model"], ver_dim=meta["ver_dim"], seg_dim=meta["seg_dim"])
    x = np.zeros((1, meta["height"], meta["width"], 3), np.float32)
    v0 = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), x)
    v1, _, _ = import_keras_h5(os.path.join(out, "weights.h5"), v0)

    path = str(tmp_path / "rt.h5")
    export_keras_h5(path, v1, model=model)
    v2_init = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(1), x)
    v2, loaded, skipped = import_keras_h5(path, v2_init)
    assert skipped == [], f"round-trip skips: {skipped}"

    for col in ("params", "batch_stats"):
        a = flatten_params(v1[col])
        b = flatten_params(v2[col])
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{col}/{k}")
