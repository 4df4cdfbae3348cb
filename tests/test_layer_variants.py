"""Remaining layer variants: CLADE-with-input, hard-label CLADE, trainable
HalfSize, and the geometric-augmentation pipeline path."""

import jax
import jax.numpy as jnp
import numpy as np

from casapose_tpu.models.layers import (
    ClassAdaptiveNorm,
    ClassAdaptiveWeightedNorm,
    ClassAdaptiveWeightedNormWithInput,
    HalfSize,
)


def _onehot(labels, c):
    return jax.nn.one_hot(jnp.asarray(labels), c)


def test_clade_selects_per_class_params():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    labels = rng.integers(0, 2, (1, 4, 4))
    seg = _onehot(labels, 2)
    layer = ClassAdaptiveWeightedNorm(2)
    variables = layer.init(jax.random.PRNGKey(0), x, seg, True)
    gamma = np.array([[2.0, 2.0, 2.0], [3.0, 3.0, 3.0]], np.float32)
    beta = np.array([[0.5, 0.5, 0.5], [-1.0, -1.0, -1.0]], np.float32)
    variables = {"params": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)},
                 "batch_stats": variables["batch_stats"]}
    # use_running_average=True with fresh stats (mean 0, var 1): the BN part
    # is (numerically) the identity, so the output is the per-class affine.
    out, _ = layer.apply(variables, x, seg, True, mutable=["batch_stats"])
    out = np.asarray(out)
    xn = np.asarray(x) / np.sqrt(1.0 + 2e-5)
    expect = np.where(labels[0][..., None] == 0, 2.0 * xn[0] + 0.5, 3.0 * xn[0] - 1.0)
    np.testing.assert_allclose(out[0], expect, atol=1e-4)


def test_clade_hard_label_variant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4)))
    layer = ClassAdaptiveNorm(3)
    variables = layer.init(jax.random.PRNGKey(0), x, labels, True)
    out, _ = layer.apply(variables, x, labels, True, mutable=["batch_stats"])
    assert np.asarray(out).shape == (1, 4, 4, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_clade_with_input_and_blend():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    seg = _onehot(rng.integers(0, 2, (2, 4, 4)), 2)
    gamma_in = jnp.asarray(rng.normal(size=(2, 2, 3)).astype(np.float32))
    beta_in = jnp.asarray(rng.normal(size=(2, 2, 3)).astype(np.float32))
    for blend in (False, True):
        layer = ClassAdaptiveWeightedNormWithInput(2, learned_blend=blend)
        variables = layer.init(jax.random.PRNGKey(0), x, seg, gamma_in, beta_in, True)
        out, _ = layer.apply(variables, x, seg, gamma_in, beta_in, True, mutable=["batch_stats"])
        assert np.all(np.isfinite(np.asarray(out)))
        if blend:
            assert "alpha_1" in variables["params"]


def test_halfsize_trainable_identity_init():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    layer = HalfSize(4, trainable=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(variables, x))
    np.testing.assert_allclose(out, np.asarray(x)[:, ::2, ::2], atol=1e-6)
    assert "kernel" in variables["params"]


def test_pipeline_rotation_translation_keypoints_consistent(tmp_path):
    """With rotation/translation augmentation on, GT keypoints must match
    projecting poses through the inverse offsets chain."""
    import os

    from tests.test_data_pipeline import OBJECTS, _make_meshes, _make_scene, K, _project
    from casapose_tpu.data.ndds import VectorfieldDataset
    from casapose_tpu.pose.geometry import transform_points_back_batch

    mesh_root = str(tmp_path / "models")
    data_root = str(tmp_path / "data")
    _make_meshes(mesh_root)
    _make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=2)
    ds = VectorfieldDataset(
        root=data_root, path_meshes=mesh_root, objectsofinterest=OBJECTS, random_crop=True,
        random_translation=(5.0, 5.0), random_rotation=5.0, use_imgaug=False,
    )
    it, _ = ds.generate_dataset(1, 1, 2, (224, 224), 0.9333, 1, len(OBJECTS), shuffle=False, seed=0)
    batch = it.get_next()
    it.close()
    # keypoints2d are in augmented network space (y, x); un-map them and
    # compare with direct projection of poses_gt.
    import jax.numpy as jnp

    off = jnp.asarray(np.tile(batch["offsets"], (len(OBJECTS), 1)))
    kp_net = jnp.asarray(batch["keypoints2d"][0, :, 0][:, :, ::-1])  # [oc, 9, 2] (x, y)
    unmapped = np.asarray(
        transform_points_back_batch(
            kp_net, off[:, 0:1], off[:, 1:2], off[:, 8:9], off[:, 9:10],
            off[:, 4:5], off[:, 5:6], off[:, 6:7], off[:, 7:8],
        )
    )
    for oi in range(len(OBJECTS)):
        proj = _project(batch["keypoints3d"][0, oi, 0].astype(np.float64),
                        batch["poses_gt"][0, oi, 0].astype(np.float64))
        np.testing.assert_allclose(unmapped[oi], proj, atol=0.5)
