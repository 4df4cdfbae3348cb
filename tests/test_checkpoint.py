"""Checkpointing, h5 import, npz round-trip, weight surgery."""

import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casapose_tpu.core.checkpoint import (
    apply_expansion_surgery,
    copy_weights_vertex,
    flatten_params,
    import_keras_h5,
    load_weights_npz,
    restore_checkpoint,
    save_checkpoint,
    save_weights_npz,
)
from casapose_tpu.models.registry import get_model


def _tiny_model(oc=2, k=3):
    model = get_model("casapose_c_gcu5", ver_dim=3 * k, seg_dim=1 + oc)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, dict(variables)


@pytest.mark.slow
def test_npz_roundtrip(tmp_path):
    _, variables = _tiny_model()
    path = str(tmp_path / "weights.npz")
    save_weights_npz(path, variables)
    # zero the params, reload, verify restored
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
    merged, n, skipped = load_weights_npz(path, zeroed)
    assert n > 50
    assert not skipped
    a = flatten_params(variables["params"])
    b = flatten_params(merged["params"])
    for key in a:
        np.testing.assert_array_equal(a[key], b[key])


def test_orbax_checkpoint_roundtrip(tmp_path):
    _, variables = _tiny_model()
    state = {"params": variables["params"], "step": np.int32(7)}
    save_checkpoint(str(tmp_path / "ckpt"), jax.device_get(state), step=7)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), jax.device_get(state))
    assert step == 7
    a = flatten_params(state["params"])
    b = flatten_params(restored["params"])
    for key in a:
        np.testing.assert_array_equal(np.asarray(a[key]), np.asarray(b[key]))


def test_import_keras_h5(tmp_path):
    """Write a synthetic Keras-format h5 covering all weight kinds and
    verify the importer maps them (incl. the PartialConv transpose)."""
    _, variables = _tiny_model()
    flat = flatten_params(variables["params"])
    stats = flatten_params(variables["batch_stats"])
    h5path = str(tmp_path / "ref.h5")
    rng = np.random.default_rng(0)

    pc_kernel = rng.normal(size=flat["pv_block_6_conv2d/kernel"].shape).astype(np.float32)
    conv0 = rng.normal(size=flat["backbone/conv0/kernel"].shape).astype(np.float32)
    clade_gamma = rng.normal(size=flat["pv_block_6_clade/gamma"].shape).astype(np.float32)
    bn_scale = rng.normal(size=flat["backbone/bn0/scale"].shape).astype(np.float32)
    bn_mean = rng.normal(size=stats["backbone/bn0/mean"].shape).astype(np.float32)

    with h5py.File(h5path, "w") as f:
        f.create_dataset("conv0/conv0/kernel:0", data=conv0)
        # PartialConvolution stored (ch, 3, 3, dim) in the reference
        f.create_dataset(
            "pv_block_6_conv2d/pv_block_6_conv2d/pv_block_6_conv2d_weights:0",
            data=pc_kernel.transpose(2, 0, 1, 3),
        )
        f.create_dataset("pv_block_6_clade/pv_block_6_clade/pv_block_6_clade_gamma:0", data=clade_gamma)
        f.create_dataset("bn0/bn0/gamma:0", data=bn_scale)
        f.create_dataset("bn0/bn0/moving_mean:0", data=bn_mean)

    merged, loaded, skipped = import_keras_h5(h5path, variables)
    assert loaded == 5, (loaded, skipped)
    out = flatten_params(merged["params"])
    out_stats = flatten_params(merged["batch_stats"])
    np.testing.assert_array_equal(out["backbone/conv0/kernel"], conv0)
    np.testing.assert_array_equal(out["pv_block_6_conv2d/kernel"], pc_kernel)
    np.testing.assert_array_equal(out["pv_block_6_clade/gamma"], clade_gamma)
    np.testing.assert_array_equal(out["backbone/bn0/scale"], bn_scale)
    np.testing.assert_array_equal(out_stats["backbone/bn0/mean"], bn_mean)


def test_expansion_surgery():
    """Expanding a 2-object net into a 3-object net copies seg-conv columns
    and CLADE rows according to the mapping."""
    _, small = _tiny_model(oc=2)
    _, big = _tiny_model(oc=3)
    mapping = np.array([[0, 0], [1, 1], [2, 3]])  # old obj2 -> new obj3
    out = apply_expansion_surgery(big["params"], small["params"], mapping)
    fs = flatten_params(small["params"])
    fo = flatten_params(out)
    np.testing.assert_array_equal(
        fo["pv_final_conv_segmentation/kernel"][0, 0, :, 3], fs["pv_final_conv_segmentation/kernel"][0, 0, :, 2]
    )
    np.testing.assert_array_equal(fo["pv_block_7_clade/gamma"][3], fs["pv_block_7_clade/gamma"][2])
    np.testing.assert_array_equal(fo["pv_block_10_clade/beta"][1], fs["pv_block_10_clade/beta"][1])


def test_copy_weights_vertex():
    _, withconf = _tiny_model(oc=2, k=3)  # ver_dim = 9
    model_nc = get_model("casapose_c_gcu5", ver_dim=6, seg_dim=3)
    x = jnp.zeros((1, 16, 16, 3))
    noconf = dict(model_nc.init(jax.random.PRNGKey(1), x, train=False))
    out = copy_weights_vertex(withconf["params"], noconf["params"], ver_dim=6)
    fo = flatten_params(out)
    fn = flatten_params(noconf["params"])
    np.testing.assert_array_equal(fo["pv_final_conv_vertex/kernel"][0, 0, :, :6],
                                  fn["pv_final_conv_vertex/kernel"][0, 0, :, :6])
