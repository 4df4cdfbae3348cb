"""Checkpointing, Keras-H5 weight import, and name-keyed weight surgery.

Covers the reference's persistence surface (SURVEY §5.4):
  * orbax checkpoints of the full train state (the reference's
    ``tf.train.Checkpoint`` kept only the network, restarting optimizer
    state on resume — we checkpoint params, batch stats, opt state, step);
  * portable weight export/import as a name-keyed flat dict (the h5
    ``save_weights(by_name=True)`` analogue), plus an importer for the
    reference's actual Keras h5 files so pretrained TF weights
    (result_w_8/result_w_13) can be converted to this framework;
  * the weight surgery used to expand a trained model to more objects
    (train_casapose.py:399-447): final-conv column copies and CLADE
    gamma/beta row copies driven by an objects_to_copy mapping.
"""

import os
from typing import Dict, Optional

import flax
import jax
import numpy as np


def flatten_params(tree) -> Dict[str, np.ndarray]:
    flat = flax.traverse_util.flatten_dict(tree, sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def unflatten_params(flat: Dict[str, np.ndarray]):
    return flax.traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


# ----------------------------------------------------------------- orbax


def save_checkpoint(path, state, step: int, keep: int = 5):
    """Save a train-state pytree with orbax under ``path/step_N``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, f"step_{step}"), state, force=True)
    # Prune old checkpoints.
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_") and d.split("_")[1].isdigit()
    )
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(path, f"step_{s}"), ignore_errors=True)


def latest_checkpoint_step(path) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_checkpoint(path, template, step: Optional[int] = None):
    """Restore a train-state pytree; ``template`` supplies the structure."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_checkpoint_step(path)
        if step is None:
            return None, None
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(os.path.join(os.path.abspath(path), f"step_{step}"), item=template)
        except ValueError as e:
            # Orbax raises ValueError for many reasons (truncated dirs,
            # corrupt metadata, ...); only rewrite the tree-structure
            # mismatch, whose most common cause here is an optimizer state
            # pytree that changed between save and resume (e.g. checkpoints
            # written before the switch to the TF-legacy Adam in
            # core/optimizer.py::adam_tf have optax.adam's chained state).
            msg = str(e).lower()
            if not any(s in msg for s in ("structure", "mismatch", "tree")):
                raise
            raise ValueError(
                f"checkpoint at {path} (step {step}) does not match the current "
                "train-state structure. If it was written by an older build with a "
                "different optimizer (optax.adam vs adam_tf), restart training from "
                "the portable weights instead: load the .npz/.h5 export via "
                "--load_h5_weights 1 --load_h5_filename <export> (optimizer state "
                "is rebuilt fresh)."
            ) from e
    return restored, step


# ------------------------------------------------------- portable weights


def save_weights_npz(path, variables):
    """Portable name-keyed export (params + batch_stats) as one .npz."""
    flat = {}
    for col, tree in variables.items():
        for k, v in flatten_params(tree).items():
            flat[f"{col}/{k}"] = v
    np.savez(path, **flat)


def load_weights_npz(path, variables, by_name=True, skip_mismatch=True):
    """Merge an .npz export into ``variables`` (name-keyed, like Keras
    ``load_weights(by_name=True, skip_mismatch=True)``)."""
    data = np.load(path)
    out = {col: flatten_params(tree) for col, tree in variables.items()}
    loaded, skipped = 0, []
    for key in data.files:
        col, _, rest = key.partition("/")
        if col in out and rest in out[col]:
            if out[col][rest].shape == data[key].shape:
                out[col][rest] = data[key]
                loaded += 1
            elif not skip_mismatch:
                raise ValueError(f"shape mismatch for {key}: {out[col][rest].shape} vs {data[key].shape}")
            else:
                skipped.append(key)
        elif not by_name:
            raise KeyError(key)
        else:
            skipped.append(key)
    result = {col: unflatten_params(flat) for col, flat in out.items()}
    return result, loaded, skipped


# ------------------------------------------------------------ h5 import


def _h5_weight_map(h5_path):
    """Flat {layer_name/weight_name: array} from a Keras save_weights h5."""
    import h5py

    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(h5_path, "r") as f:
        f.visititems(visit)
    return out


def import_keras_h5(h5_path, variables, verbose=False):
    """Convert a reference Keras h5 export into our variable tree.

    Handles the layout differences, validated against real ``save_weights``
    files produced by the reference model code (tests/test_tf_parity.py):

      * backbone layers are nested under the backbone sub-Model group
        (``model/<layer>/<weight>:0``) -> our ``backbone/<layer>`` subtree;
      * decoder layers duplicate the layer name
        (``<layer>/<layer>/<weight>:0``);
      * CLADE running stats live one group deeper, under the layer's
        parameter-free inner BN (``<layer>/<layer>/sync_batch_normalization/
        moving_*``, ref _normalization_layers.py:94) -> ``<layer>/bn/*``;
      * non-shared PartialConvolution layers are named
        ``pv_block_N_prepare_conv2d`` (ref casapose.py:63-64) while the
        shared ones are ``pv_block_N_M_conv2d`` -> both map to our
        ``pv_block_*_conv2d``; their kernels are stored (ch, 3, 3, dim)
        (ref _normalization_layers.py:314-318) -> HWIO transpose;
      * the trainable HalfSize variant wraps an auto-named inner Conv2D
        (ref _normalization_layers.py:266-281) -> ``<layer>/kernel``;
      * BN gamma/beta/moving_* -> flax scale/bias/mean/var; CLADE per-class
        tables keep their (C, ch) layout.

    Unknown datasets are skipped (by-name, skip-mismatch semantics).
    """
    raw = _h5_weight_map(h5_path)
    params = flatten_params(variables["params"])
    stats = flatten_params(variables.get("batch_stats", {}))

    def owner_of(groups):
        """The Keras layer that owns a dataset, given its h5 group path."""
        owner = groups[-1]
        # Auto-named inner sublayers (CLADE's parameter-free BN, trainable
        # HalfSize's Conv2D): the owning layer is the enclosing group.
        if owner.split("_")[0] in ("sync", "conv2d", "batch") or owner.startswith(
            ("sync_batch_normalization", "conv2d", "batch_normalization")
        ):
            if len(groups) >= 2:
                owner = groups[-2]
        return owner

    def candidates(layer):
        names = [layer]
        if layer.endswith("_prepare_conv2d"):  # non-shared PartialConvolution
            names.append(layer[: -len("_prepare_conv2d")] + "_conv2d")
        # our tree prefixes: backbone layers live under backbone/
        return [n for base in names for n in (base, f"backbone/{base}")]

    loaded, skipped = 0, []
    for key, value in raw.items():
        parts = [p for p in key.split("/") if p]
        wname = parts[-1].split(":")[0]
        groups = parts[:-1]
        if not groups:
            skipped.append(key)
            continue
        layer = owner_of(groups)
        placed = False
        for base in candidates(layer):
            if wname == "kernel":
                k = f"{base}/kernel"
                if k in params and params[k].shape == value.shape:
                    params[k] = value
                    placed = True
            elif wname in ("gamma", "beta") or wname.endswith("_gamma") or wname.endswith("_beta"):
                suffix = "scale" if wname.endswith("gamma") else "bias"
                kbn = f"{base}/{suffix}"
                kclade = f"{base}/{'gamma' if wname.endswith('gamma') else 'beta'}"
                if kbn in params and params[kbn].shape == value.shape:
                    params[kbn] = value
                    placed = True
                elif kclade in params and params[kclade].shape == value.shape:
                    params[kclade] = value
                    placed = True
            elif wname in ("moving_mean", "moving_variance"):
                suffix = "mean" if wname == "moving_mean" else "var"
                for k in (f"{base}/{suffix}", f"{base}/bn/{suffix}"):
                    if k in stats and stats[k].shape == value.shape:
                        stats[k] = value
                        placed = True
                        break
            elif wname.endswith("_weights"):  # PartialConvolution (ch,3,3,dim)
                k = f"{base}/kernel"
                if k in params and value.ndim == 4:
                    transposed = value.transpose(1, 2, 0, 3)
                    if params[k].shape == transposed.shape:
                        params[k] = transposed
                        placed = True
            elif wname.endswith("_alpha_1") or wname.endswith("_alpha_2"):
                k = f"{base}/alpha_{wname[-1]}"
                if k in params and params[k].shape == value.shape:
                    params[k] = value
                    placed = True
            if placed:
                break
        if placed:
            loaded += 1
        else:
            skipped.append(key)
    if verbose and skipped:
        print(f"import_keras_h5: loaded {loaded}, skipped {len(skipped)}: {skipped[:10]}...")
    out = dict(variables)
    out["params"] = unflatten_params(params)
    if stats:
        out["batch_stats"] = unflatten_params(stats)
    return out, loaded, skipped


# ------------------------------------------------ ImageNet backbone init

# qubvel classification_models ImageNet exports (no-top) — the exact files
# the reference auto-downloads for its backbone (weights.py:43-358,
# resnet.py:322-326). URL/md5 pairs are public release artifacts.
IMAGENET_WEIGHTS = {
    name: {
        "url": f"https://github.com/qubvel/classification_models/releases/download/0.0.1/{name}_imagenet_1000_no_top.h5",
        "file": f"{name}_imagenet_1000_no_top.h5",
        "md5": md5,
    }
    for name, md5 in [
        ("resnet18", "318e3ac0cd98d51e917526c9f62f0b50"),
        ("resnet34", "8caaa0ad39d927cb8ba5385bf945d582"),
        ("resnet50", "db3b217156506944570ac220086f09b6"),
        ("resnet101", "1016e7663980d5597a4e224d915c342d"),
        ("resnet152", "5867b94098df4640918941115db93734"),
    ]
}


def find_imagenet_h5(base_model: str) -> Optional[str]:
    """Locate (or fetch) the ImageNet backbone h5.

    Resolution order: ``$CASAPOSE_IMAGENET_H5`` -> the Keras cache the
    reference populates (``~/.keras/models/``) -> download (skipped when
    offline). Returns None when unavailable.
    """
    spec = IMAGENET_WEIGHTS.get(base_model)
    if spec is None:
        return None
    override = os.environ.get("CASAPOSE_IMAGENET_H5")
    if override and os.path.exists(override):
        return override
    cache = os.path.join(os.path.expanduser("~"), ".keras", "models", spec["file"])
    if os.path.exists(cache):
        return cache
    try:
        import hashlib
        import urllib.request

        os.makedirs(os.path.dirname(cache), exist_ok=True)
        # Download to a temp name and rename only after the md5 checks out,
        # so an interrupted fetch can never leave a truncated file that
        # poisons every later run.
        tmp = cache + ".download"
        urllib.request.urlretrieve(spec["url"], tmp)  # noqa: S310 — fixed release URL
        with open(tmp, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()  # noqa: S324 — artifact integrity only
        if digest != spec["md5"]:
            os.remove(tmp)
            raise ValueError(f"md5 mismatch ({digest} != {spec['md5']})")
        os.replace(tmp, cache)
        return cache
    except Exception as e:  # offline / fetch failure: pretrained init is skipped
        print(f"imagenet weights unavailable for {base_model}: {e}")
        return None


def load_imagenet_backbone(variables, base_model: str = "resnet18", path: Optional[str] = None, verbose=False):
    """Initialize the backbone subtree from a qubvel-format ImageNet h5.

    The h5 stores top-level layer groups (same names as our backbone
    modules); ``import_keras_h5`` maps them under ``backbone/``. Decoder
    parameters are untouched (there are none in the file). Returns
    (variables, n_loaded) — n_loaded == 0 means nothing was initialized.
    """
    if path is None:
        path = find_imagenet_h5(base_model)
    if path is None:
        return variables, 0
    variables, loaded, skipped = import_keras_h5(path, variables, verbose=verbose)
    # Only backbone datasets should remain unmapped (the classification
    # file has no decoder layers); anything loaded outside backbone/ would
    # indicate a name collision — the layer names are disjoint by design.
    return variables, loaded


# --------------------------------------------------------- weight surgery


def copy_weights_segmentation(params, params_backup, range_out, range_in, layer="pv_final_conv_segmentation"):
    """Copy final-conv output columns per class mapping (expand to more
    objects; train_casapose.py:414-420)."""
    flat = flatten_params(params)
    backup = flatten_params(params_backup)
    k = f"{layer}/kernel"
    kernel = flat[k].copy()
    kernel[0, 0, :, list(range_out)] = backup[k][0, 0, :, list(range_in)]
    flat[k] = kernel
    return unflatten_params(flat)


def copy_clade_weights(params, params_backup, range_out, range_in, layer):
    """Copy CLADE gamma/beta rows per class mapping (train_casapose.py:430-437)."""
    flat = flatten_params(params)
    backup = flatten_params(params_backup)
    for wname in ("gamma", "beta"):
        k = f"{layer}/{wname}"
        table = flat[k].copy()
        table[list(range_out)] = backup[k][list(range_in)]
        flat[k] = table
    return unflatten_params(flat)


def copy_weights_vertex(params, params_backup, ver_dim, layer="pv_final_conv_vertex"):
    """Copy the first ``ver_dim`` output columns (add confidence maps to a
    confidence-less net; train_casapose.py:401-409)."""
    flat = flatten_params(params)
    backup = flatten_params(params_backup)
    k = f"{layer}/kernel"
    kernel = flat[k].copy()
    kernel[0, 0, :, :ver_dim] = backup[k][0, 0, :, :ver_dim]
    flat[k] = kernel
    return unflatten_params(flat)


def apply_expansion_surgery(params, params_backup, objects_to_copy):
    """Full expansion surgery: seg conv + all five CLADE tables
    (train_casapose.py:439-447)."""
    range_in = objects_to_copy[:, 0].tolist()
    range_out = objects_to_copy[:, 1].tolist()
    params = copy_weights_segmentation(params, params_backup, range_out, range_in)
    for n in range(6, 11):
        params = copy_clade_weights(params, params_backup, range_out, range_in, f"pv_block_{n}_clade")
    return params
