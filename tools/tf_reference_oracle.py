#!/usr/bin/env python
"""Run the REFERENCE TensorFlow model as a parity oracle.

Executes the actual reference implementation (``/root/reference``, or
``$CASAPOSE_REFERENCE_DIR``) on CPU and records fixtures the JAX test suite
compares against:

  forward  build a reference model variant with deterministically seeded
           weights (including non-trivial BN moving statistics so a
           mis-mapped stat cannot hide), ``save_weights`` to Keras h5, run a
           forward pass on a fixed input, and save input/output plus
           intermediate taps to .npz.
  voting   run the reference ``CoordLSVotingWeighted`` layer (float64
           accumulation, voting_layers_2d.py:83-122) on seeded inputs.

Environment shims (this tool does NOT modify the reference tree):
  * ``TF_USE_LEGACY_KERAS=1`` — the reference targets TF2.9/Keras 2; the
    legacy ``tf_keras`` package provides the matching API on modern TF.
  * ``tensorflow_addons`` is absent here; a stub provides the two ops the
    reference uses: ``image.transform`` via the core TF op the real tfa
    wraps (ImageProjectiveTransformV3) and ``image.connected_components``
    via scipy.ndimage.label (same 4-connectivity).

This gives the "cross-framework parity harness" from SURVEY.md §7 step 3:
reference h5 -> import_keras_h5 -> activation/output comparison.
"""

import argparse
import json
import os
import sys


def _setup_env():
    if os.path.dirname(os.path.abspath(__file__)) not in sys.path:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _reference_shims import setup_reference_env

    return setup_reference_env()


def _seed_weights(net):
    """Deterministic, name-keyed weight values (order-independent)."""
    import hashlib

    import numpy as np

    for w in net.weights:
        name = w.name
        seed = int(hashlib.sha256(name.encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed)
        shape = w.shape.as_list()
        base = name.split("/")[-1].split(":")[0]
        if "moving_variance" in base:
            val = rng.uniform(0.5, 1.5, shape)
        elif "moving_mean" in base:
            val = rng.normal(0.0, 0.1, shape)
        elif base == "gamma" or base.endswith("_gamma"):
            val = rng.uniform(0.8, 1.2, shape)
        elif base == "beta" or base.endswith("_beta"):
            val = rng.normal(0.0, 0.1, shape)
        elif base.endswith("_alpha_1") or base.endswith("_alpha_2"):
            val = rng.uniform(0.2, 0.8, shape)
        else:  # conv kernels / partial-conv weights
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else int(shape[0])
            val = rng.normal(0.0, np.sqrt(2.0 / max(fan_in, 1)), shape)
        w.assign(val.astype(np.float32))


def cmd_forward(args):
    _setup_env()
    import numpy as np
    import tensorflow as tf

    from casapose.pose_models.tfkeras import Classifiers

    tf.random.set_seed(0)
    ver_dim = 2 * args.points + (args.points if args.confidence else 0)
    seg_dim = 1 + args.objects
    kw = dict(
        ver_dim=ver_dim,
        seg_dim=seg_dim,
        input_shape=(args.height, args.width, 3),
        weights=None,
        base_model=args.base_model,
    )
    if args.gt_seg_input:
        kw["input_segmentation_shape"] = (args.height, args.width, seg_dim)
    else:
        kw["input_segmentation_shape"] = None
    if args.decoder_params:
        # Drive the generic CASAPose builder with custom per-layer wiring
        # (casapose.py:145; what `casapose_custom` exposes for re-config).
        from casapose.pose_models.models import casapose as ref_casapose

        layer_params = [
            ref_casapose.DecoderParams(*(c == "1" for c in g))
            for g in args.decoder_params.split(",")
        ]
        net = ref_casapose.CASAPose(layer_params, **kw, **Classifiers.get_kwargs())
    else:
        net = Classifiers.get(args.model)(**kw)
    _seed_weights(net)

    os.makedirs(args.out, exist_ok=True)
    h5_path = os.path.join(args.out, "weights.h5")
    net.save_weights(h5_path)

    rng = np.random.default_rng(7)
    x = rng.uniform(-1.0, 1.0, (args.batch, args.height, args.width, 3)).astype(np.float32)
    inputs = [x]
    fixture = {"input": x}
    if args.gt_seg_input:
        labels = rng.integers(0, seg_dim, (args.batch, args.height, args.width))
        gt_seg = np.eye(seg_dim, dtype=np.float32)[labels]
        inputs.append(gt_seg)
        fixture["gt_seg"] = gt_seg
    out = net(inputs if len(inputs) > 1 else inputs[0], training=False)
    fixture["output"] = np.asarray(out)

    if args.taps:
        tap_layers = []
        for layer in net.layers:
            if layer.name.startswith(("pv_block", "pv_final", "segmentation_")) or layer.name == "model":
                tap_layers.append(layer)
        outs = []
        names = []
        for layer in tap_layers:
            o = layer.output
            if isinstance(o, (list, tuple)):
                for i, oo in enumerate(o):
                    outs.append(oo)
                    names.append(f"tap.{layer.name}.{i}")
            else:
                outs.append(o)
                names.append(f"tap.{layer.name}")
        tapped = tf.keras.Model(net.inputs, outs)
        vals = tapped(inputs if len(inputs) > 1 else inputs[0], training=False)
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        for n, v in zip(names, vals):
            fixture[n] = np.asarray(v)

    np.savez(os.path.join(args.out, "fixture.npz"), **fixture)
    meta = dict(
        model=args.model,
        ver_dim=ver_dim,
        seg_dim=seg_dim,
        points=args.points,
        objects=args.objects,
        height=args.height,
        width=args.width,
        confidence=args.confidence,
        gt_seg_input=args.gt_seg_input,
        base_model=args.base_model,
        n_weights=len(net.weights),
    )
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps({"ok": True, **meta}))


def cmd_backbone(args):
    """Export the bare reference ResNet backbone (qubvel layout) + taps.

    The saved h5 has the same top-level-layer-group layout as the qubvel
    classification_models ImageNet files the reference auto-downloads
    (weights.py:43-358), so it stands in for them in offline tests.
    """
    _setup_env()
    import numpy as np
    import tensorflow as tf

    from casapose.pose_models.models.resnet import get_backbone
    from casapose.pose_models.tfkeras import Classifiers

    tf.random.set_seed(0)
    backbone = get_backbone(
        args.base_model, input_shape=(args.height, args.width, 3), weights=None, **Classifiers.get_kwargs()
    )
    _seed_weights(backbone)
    os.makedirs(args.out, exist_ok=True)
    backbone.save_weights(os.path.join(args.out, "backbone.h5"))
    rng = np.random.default_rng(5)
    x = rng.uniform(-1.0, 1.0, (1, args.height, args.width, 3)).astype(np.float32)
    feats = backbone(x, training=False)
    fixture = {"input": x}
    for i, ft in enumerate(feats):
        fixture[f"feat{i}"] = np.asarray(ft)
    np.savez(os.path.join(args.out, "backbone_fixture.npz"), **fixture)
    print(json.dumps({"ok": True, "n_weights": len(backbone.weights), "n_feats": len(feats)}))


def cmd_voting(args):
    _setup_env()
    import numpy as np

    from casapose.pose_estimation.voting_layers_2d import CoordLSVotingWeighted

    rng = np.random.default_rng(11)
    b, h, w = args.batch, args.height, args.width
    seg_dim = 1 + args.objects
    k = args.points
    # Blobby segmentation logits: a few square objects on background.
    seg = rng.normal(0.0, 0.3, (b, h, w, seg_dim)).astype(np.float32)
    seg[..., 0] += 2.0  # background wins by default
    for o in range(args.objects):
        cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
        r = int(rng.integers(4, 9))
        seg[:, max(cy - r, 0) : cy + r, max(cx - r, 0) : cx + r, o + 1] += 5.0
    dirs = rng.normal(0.0, 1.0, (b, h, w, 2 * k)).astype(np.float32)
    conf = rng.normal(0.0, 1.0, (b, h, w, k)).astype(np.float32)

    layer = CoordLSVotingWeighted(
        name="coords_ls_voting",
        num_classes=args.objects,
        num_points=k,
        filter_estimates=args.filter,
    )
    out = layer([seg, dirs, conf])
    np.savez(
        os.path.join(args.out, "voting_fixture.npz"),
        seg=seg,
        dirs=dirs,
        conf=conf,
        output=np.asarray(out),
        filter=np.asarray(args.filter),
    )
    print(json.dumps({"ok": True, "shape": list(np.asarray(out).shape), "filter": bool(args.filter)}))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("forward")
    f.add_argument("--model", default="casapose_c_gcu5")
    f.add_argument("--base-model", default="resnet18")
    f.add_argument("--out", required=True)
    f.add_argument("--height", type=int, default=128)
    f.add_argument("--width", type=int, default=128)
    f.add_argument("--objects", type=int, default=8)
    f.add_argument("--points", type=int, default=9)
    f.add_argument("--batch", type=int, default=1)
    f.add_argument("--confidence", action="store_true", default=True)
    f.add_argument("--no-confidence", dest="confidence", action="store_false")
    f.add_argument("--gt-seg-input", action="store_true")
    f.add_argument("--taps", action="store_true")
    f.add_argument("--decoder-params", default=None, help="5 comma-separated 5-bit groups 'wc pc gu bu rc'")
    f.set_defaults(func=cmd_forward)

    b = sub.add_parser("backbone")
    b.add_argument("--base-model", default="resnet18")
    b.add_argument("--out", required=True)
    b.add_argument("--height", type=int, default=64)
    b.add_argument("--width", type=int, default=64)
    b.set_defaults(func=cmd_backbone)

    v = sub.add_parser("voting")
    v.add_argument("--out", required=True)
    v.add_argument("--height", type=int, default=96)
    v.add_argument("--width", type=int, default=128)
    v.add_argument("--objects", type=int, default=4)
    v.add_argument("--points", type=int, default=9)
    v.add_argument("--batch", type=int, default=2)
    v.add_argument("--filter", action="store_true")
    v.set_defaults(func=cmd_voting)

    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    args.func(args)


if __name__ == "__main__":
    main()
