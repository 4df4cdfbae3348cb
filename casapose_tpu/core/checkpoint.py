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


# ------------------------------------------------------------ h5 export


def _backbone_layer_order(layer_names):
    """qubvel-ResNet layer creation order (the order Keras ``save_weights``
    emits backbone weights in): bn_data, conv0, bn0, stages (per unit:
    bn1, conv1, bn2, conv2, [bn3, conv3], sc), final bn1."""
    import re

    def key(n):
        if n == "bn_data":
            return (0, 0, 0, 0)
        if n == "conv0":
            return (1, 0, 0, 0)
        if n == "bn0":
            return (2, 0, 0, 0)
        m = re.match(r"stage(\d+)_unit(\d+)_(bn|conv|sc)(\d*)$", n)
        if m:
            s, u, kind, idx = int(m.group(1)), int(m.group(2)), m.group(3), m.group(4)
            sub = 99 if kind == "sc" else int(idx) * 2 + (0 if kind == "bn" else 1)
            return (3, s, u, sub)
        if n == "bn1":
            return (4, 0, 0, 0)
        # Unrecognized names sort after the known groups by name: the
        # tiebreak must be deterministic across processes (a str hash would
        # scramble Keras by-order assignment per PYTHONHASHSEED).
        return (5, 0, 0, n)

    return sorted(layer_names, key=key)


def partial_conv_layer_names(spec):
    """Decoder-2 blocks the reference builds as (non-shared)
    ``PartialConvolution`` layers — their h5 group is
    ``pv_block_N_prepare_conv2d`` with a (ch, 3, 3, dim) ``_weights`` dataset
    (ref casapose.py:63-64, _normalization_layers.py:314-318)."""
    return {
        f"pv_block_{i + 6}_conv2d"
        for i, dp in enumerate(getattr(spec, "decoder_params", ()))
        if dp.partial_conv and not dp.reuse_conv
    }


def export_keras_h5(h5_path, variables, model=None, spec=None, backbone_name="model"):
    """Write ``variables`` as a reference-compatible Keras ``save_weights``
    h5 — the inverse of :func:`import_keras_h5`.

    The file loads cleanly into the reference's actual models via
    ``net.load_weights(path, by_name=True, skip_mismatch=True)``
    (reference test_casapose.py:228, train_casapose.py:374-378), which
    matches TOP-LEVEL layer group names against ``net.layers`` and assigns
    weights within a group BY ORDER against
    ``layer.trainable_weights + layer.non_trainable_weights`` — so both the
    group names and the per-group ``weight_names`` order here replicate what
    Keras itself writes (validated dataset-for-dataset against reference
    ``save_weights`` output in tests/test_h5_export.py):

      * backbone -> one sub-Model group (default name ``model``: the first
        auto-named Functional in a fresh reference process, which is the
        backbone — it is built before the outer CASAPose net); weights
        ordered all-trainable-then-all-non-trainable in layer creation
        order (:func:`_backbone_layer_order`);
      * BN layers -> [gamma, beta, moving_mean, moving_variance];
      * CLADE -> [<g>_beta, <g>_gamma, inner-BN moving_mean/variance]
        (beta created before gamma, _normalization_layers.py:?build);
        the learned-blend variant appends alpha_1/alpha_2 after gamma;
      * non-shared PartialConvolution blocks (``model``'s spec says which)
        -> ``pv_block_N_prepare_conv2d`` groups with the kernel transposed
        HWIO -> (ch, 3, 3, dim); shared ``pv_block_X_Y_conv2d`` groups
        (recognizable by name) use the same layout;
      * trainable HalfSize -> ``<g>/conv2d/kernel``.

    ``model`` (a CASAPoseModel) or ``spec`` supplies the variant's
    partial-conv layout; with neither, decoder convs export as plain Conv2D
    kernels (correct only for variants without partial convolutions).
    """
    import h5py

    if spec is None and model is not None:
        spec = getattr(model, "spec", None)
    partial_layers = partial_conv_layer_names(spec) if spec is not None else set()

    params = flatten_params(variables.get("params", {}))
    stats = flatten_params(variables.get("batch_stats", {}))

    # ---- partition by top-level layer ------------------------------------
    def top(k):
        return k.split("/", 1)[0]

    backbone_p = {k.split("/", 1)[1]: v for k, v in params.items() if top(k) == "backbone"}
    backbone_s = {k.split("/", 1)[1]: v for k, v in stats.items() if top(k) == "backbone"}
    decoder_layers = sorted({top(k) for k in params if top(k) != "backbone"})

    groups = []  # (group_name, [(dataset_relpath, array), ...])

    # ---- backbone sub-Model group ----------------------------------------
    if backbone_p:
        bb_layers = _backbone_layer_order(sorted({k.split("/")[0] for k in list(backbone_p) + list(backbone_s)}))
        wlist = []
        for layer in bb_layers:  # trainable, creation order per layer
            if f"{layer}/kernel" in backbone_p:
                wlist.append((f"{layer}/kernel:0", backbone_p[f"{layer}/kernel"]))
            if f"{layer}/scale" in backbone_p:
                wlist.append((f"{layer}/gamma:0", backbone_p[f"{layer}/scale"]))
            if f"{layer}/bias" in backbone_p:
                wlist.append((f"{layer}/beta:0", backbone_p[f"{layer}/bias"]))
        for layer in bb_layers:  # then ALL non-trainable, same layer order
            if f"{layer}/mean" in backbone_s:
                wlist.append((f"{layer}/moving_mean:0", backbone_s[f"{layer}/mean"]))
                wlist.append((f"{layer}/moving_variance:0", backbone_s[f"{layer}/var"]))
        groups.append((backbone_name, wlist))

    # ---- decoder layers ---------------------------------------------------
    import re

    for layer in decoder_layers:
        p = {k.split("/", 1)[1]: v for k, v in params.items() if top(k) == layer}
        s = {k.split("/", 1)[1]: v for k, v in stats.items() if top(k) == layer}
        shared = re.match(r"pv_block_\d+_\d+_conv2d$", layer) is not None
        if "kernel" in p and (shared or layer in partial_layers):
            # PartialConvolution storage layout: (ch, kh, kw, dim)
            gname = layer if shared else layer.replace("_conv2d", "_prepare_conv2d")
            groups.append((gname, [(f"{gname}_weights:0", p["kernel"].transpose(2, 0, 1, 3))]))
        elif "kernel" in p and layer.startswith("segmentation_"):
            # trainable HalfSize: auto-named inner Conv2D
            groups.append((layer, [("conv2d/kernel:0", p["kernel"])]))
        elif "kernel" in p:
            groups.append((layer, [("kernel:0", p["kernel"])]))
        elif "gamma" in p:  # CLADE family: beta before gamma (creation order)
            wlist = [(f"{layer}_beta:0", p["beta"]), (f"{layer}_gamma:0", p["gamma"])]
            for a in ("alpha_1", "alpha_2"):  # learned-blend variant
                if a in p:
                    wlist.append((f"{layer}_{a}:0", p[a]))
            if "bn/mean" in s:
                wlist.append(("sync_batch_normalization/moving_mean:0", s["bn/mean"]))
                wlist.append(("sync_batch_normalization/moving_variance:0", s["bn/var"]))
            groups.append((layer, wlist))
        elif "scale" in p or "bias" in p:  # BatchNorm
            wlist = []
            if "scale" in p:
                wlist.append(("gamma:0", p["scale"]))
            if "bias" in p:
                wlist.append(("beta:0", p["bias"]))
            if "mean" in s:
                wlist.append(("moving_mean:0", s["mean"]))
                wlist.append(("moving_variance:0", s["var"]))
            groups.append((layer, wlist))
        else:  # future layer kinds: name-sorted fallback
            wlist = [(f"{k}:0", v) for k, v in sorted(p.items())] + [(f"{k}:0", v) for k, v in sorted(s.items())]
            groups.append((layer, wlist))

    # ---- write the Keras save_weights format ------------------------------
    os.makedirs(os.path.dirname(os.path.abspath(h5_path)) or ".", exist_ok=True)
    with h5py.File(h5_path, "w") as f:
        str_dt = h5py.special_dtype(vlen=str)
        f.attrs.create("layer_names", [g for g, _ in groups], dtype=str_dt)
        f.attrs["backend"] = "tensorflow"
        f.attrs["keras_version"] = "2.21.0"
        for gname, wlist in groups:
            g = f.create_group(gname)
            # Keras nests datasets under <group>/<layer>/<weight>: decoder
            # groups duplicate the layer name, the backbone keeps sublayer
            # paths — both are just the dataset relpath below.
            names = []
            for rel, arr in wlist:
                # backbone datasets sit at <sublayer>/<weight>; every other
                # layer prefixes its own name (Keras writes the variable's
                # full name, which starts with the owning layer)
                path = rel if gname == backbone_name else f"{gname}/{rel}"
                names.append(path)
                g.create_dataset(path, data=np.asarray(arr, np.float32))
            g.attrs.create("weight_names", names, dtype=str_dt)
    return h5_path


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
