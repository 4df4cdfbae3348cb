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
        val = val.astype(np.float32)
        # Truncate to bf16-representable values. Parity is unaffected (both
        # frameworks load the SAME h5), but 16 zero mantissa bits make the
        # committed suite_cache_seed fixture h5s zlib-compress ~2x.
        val = (val.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
        w.assign(val)


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


def cmd_ransac(args):
    """Run the reference RANSAC voting layer on seeded masks/fields.

    The fixture carries geometrically meaningful inputs: per-class blob
    masks with unit direction fields pointing at known keypoints (clean,
    or with deterministic angular noise). PRNG streams differ between
    frameworks, so parity is asserted on the CONVERGED keypoints, not the
    hypothesis sequence (reference ransac_voting.py:276-484).
    """
    _setup_env()
    import numpy as np

    from casapose.pose_estimation.ransac_voting import ransac_voting_layer_all_masks

    rng = np.random.default_rng(13)
    b, h, w = args.batch, args.height, args.width
    oc, vn = args.objects, args.points
    mask = np.zeros((b, h, w, oc), np.float32)
    vertex = np.zeros((b, h, w, vn, 2), np.float32)
    gt_kp = np.zeros((b, oc, vn, 2), np.float32)  # (x, y)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32) + 0.5,
                         np.arange(w, dtype=np.float32) + 0.5, indexing="ij")
    for bi in range(b):
        for o in range(oc):
            cy = int(rng.integers(16, h - 16))
            cx = int(rng.integers(16, w - 16))
            r = int(rng.integers(8, 14))
            m = np.zeros((h, w), bool)
            m[cy - r : cy + r, cx - r : cx + r] = True
            mask[bi, :, :, o] = m
            kp = np.stack(
                [rng.uniform(cx - r, cx + r, vn), rng.uniform(cy - r, cy + r, vn)], axis=1
            ).astype(np.float32)
            gt_kp[bi, o] = kp
            dx = kp[None, None, :, 0] - xs[:, :, None]
            dy = kp[None, None, :, 1] - ys[:, :, None]
            norm = np.sqrt(dx * dx + dy * dy) + 1e-9
            dx, dy = dx / norm, dy / norm
            if args.noise > 0:
                ang = rng.normal(0.0, args.noise, (h, w, vn)).astype(np.float32)
                ca, sa = np.cos(ang), np.sin(ang)
                dx, dy = ca * dx - sa * dy, sa * dx + ca * dy
            # vertex channels are (dy, dx): the layer reverses to (dx, dy)
            # before matching (x, y) coords (ransac_voting.py:309).
            vertex[bi, :, :, :, 0] = np.where(m[:, :, None], dy, vertex[bi, :, :, :, 0])
            vertex[bi, :, :, :, 1] = np.where(m[:, :, None], dx, vertex[bi, :, :, :, 1])
    out = ransac_voting_layer_all_masks(
        mask, vertex, round_hyp_num=args.hyps, inlier_thresh=args.inlier_thresh,
        max_iter=args.max_iter,
    )
    np.savez(
        os.path.join(args.out, "ransac_fixture.npz"),
        mask=mask, vertex=vertex, gt_kp=gt_kp, output=np.asarray(out),
        hyps=args.hyps, inlier_thresh=args.inlier_thresh, max_iter=args.max_iter,
        noise=args.noise,
    )
    print(json.dumps({"ok": True, "shape": list(np.asarray(out).shape), "noise": args.noise}))


def cmd_eval(args):
    """Run the reference's ACTUAL eval harness (test_casapose.py) on a
    synthetic scene, capturing its CSVs and summary output as a fixture.

    Same pattern as ``train``: deterministic scene + seeded h5, runpy of
    the real script, everything persisted in the fixture dir so the JAX
    harness evaluates the identical inputs. ``--coords 0`` exercises the
    RANSAC/pvnet pose path (reference pose_evaluation.py:11-101) that the
    LS-voting e2e comparison never touches (VERDICT r2 item 2b).
    """
    import runpy
    import shutil

    ref = _setup_env()
    import tensorflow as tf

    from synthetic_scene import make_meshes, make_scene, object_names

    out = args.out
    mesh_root = os.path.join(out, "models")
    data_root = os.path.join(out, "data")
    ref_out = os.path.join(out, "ref_out")
    ref_eval = os.path.join(out, "ref_eval")
    # --n-obj N builds an N-object scene (e.g. 13 = the config_13-scale
    # round trip); 0 keeps the legacy 2-object scene whose bytes the
    # committed fixture keys pin.
    objects = object_names(getattr(args, "n_obj", 0) or None)
    make_meshes(mesh_root, objects)
    make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=args.images, objects=objects)
    os.makedirs(os.path.join(ref_out, "frozen_model"), exist_ok=True)

    from casapose.pose_models.tfkeras import Classifiers

    tf.random.set_seed(0)
    n_obj = len(objects)
    confidence = bool(args.confidence)
    if getattr(args, "weights_h5", None):
        # External weights (the JAX framework's export_keras_h5 output):
        # the round-trip proof that weights trained THERE evaluate
        # identically under the reference's own harness. --weights-sha is
        # unused here; it exists so the fixture cache key tracks content.
        shutil.copyfile(args.weights_h5, os.path.join(out, "weights.h5"))
        shutil.copyfile(args.weights_h5, os.path.join(ref_out, "frozen_model", "weights.h5"))
        # Reset Keras auto-naming so the net test_casapose.py builds gets
        # backbone name "model" — the name export_keras_h5 writes (the
        # backbone is the first unnamed Functional in a fresh process).
        tf.keras.backend.clear_session()
        # Record what the harness actually loads: a silent by_name skip
        # (wrong group name / order / shape) leaves random-init weights,
        # which this checksum exposes directly.
        _orig_load = tf.keras.Model.load_weights
        _planted = {
            os.path.abspath(os.path.join(out, "weights.h5")),
            os.path.abspath(os.path.join(ref_out, "frozen_model", "weights.h5")),
        }

        def _load_and_checksum(self, *a, **k):
            r = _orig_load(self, *a, **k)
            # Checksum ONLY the load of the planted external h5: if the
            # harness ever loads weights again (second net, retry), the
            # record must keep reflecting the load the round-trip test
            # asserts on, not whatever came last (ADVICE r4).
            fp = a[0] if a else k.get("filepath")
            if fp is None or os.path.abspath(str(fp)) not in _planted:
                return r
            try:
                import numpy as _np

                s = float(sum(_np.abs(w).sum() for w in self.get_weights()))
                with open(os.path.join(out, "load_checksum.json"), "w") as fh:
                    json.dump({"n_weights": len(self.weights), "abs_sum": s}, fh)
            except Exception:
                pass
            return r

        tf.keras.Model.load_weights = _load_and_checksum
    else:
        ver_dim = 2 * args.points
        if args.model == "pvnet":
            ver_dim *= n_obj
        if confidence:
            ver_dim += args.points
        net = Classifiers.get(args.model)(
            ver_dim=ver_dim,
            seg_dim=1 + n_obj,
            input_shape=(64, 64, 3),
            weights=None,
            base_model="resnet18",
            input_segmentation_shape=None,
        )
        _seed_weights(net)
        net.save_weights(os.path.join(out, "weights.h5"))
        shutil.copyfile(os.path.join(out, "weights.h5"), os.path.join(ref_out, "frozen_model", "weights.h5"))
        del net
        tf.keras.backend.clear_session()

    import casapose.pose_models.models.resnet as ref_resnet

    ref_resnet.load_model_weights = lambda *a, **k: None

    argv = [
        os.path.join(ref, "test_casapose.py"),
        "--data", data_root + "_none",  # != datatest: no validation split
        "--datatest", data_root, "--datameshes", mesh_root,
        "--object", ",".join(objects), "--modelname", args.model,
        "--backbonename", "resnet18",
        "--estimate_confidence", str(int(confidence)),
        "--estimate_coords", str(args.coords), "--no_points", str(args.points),
        "--imagesize_test", "240", "320", "--train_vectors_with_ground_truth", "0",
        "--load_h5_weights", "1", "--load_h5_filename", "weights",
        "--outf", ref_out, "--evalf", ref_eval, "--min_object_size_test", "1",
        "--workers", "1", "--prefetch", "1", "--manualseed", "3",
    ] + ([t for t in args.extra.split(",") if t] if args.extra else [])
    # tf.print writes to the C-level stderr: capture the summary metrics
    # ("2D Valid (mean): ...") with an fd-level redirect.
    log_path = os.path.join(out, "ref_log.txt")
    old_argv = sys.argv
    sys.argv = argv
    old_out, old_err = os.dup(1), os.dup(2)
    sys.stdout.flush()
    sys.stderr.flush()
    with open(log_path, "w") as logf:
        os.dup2(logf.fileno(), 1)
        os.dup2(logf.fileno(), 2)
        try:
            runpy.run_path(argv[0], run_name="__main__")
        finally:
            sys.stdout.flush()
            sys.stderr.flush()
            os.dup2(old_out, 1)
            os.dup2(old_err, 2)
            os.close(old_out)
            os.close(old_err)
            sys.argv = old_argv
            if getattr(args, "weights_h5", None):
                tf.keras.Model.load_weights = _orig_load  # batch mode shares the process
    assert os.path.exists(os.path.join(ref_eval, "loss_test_eval.csv"))
    print(json.dumps({"ok": True, "model": args.model, "coords": args.coords}))


def cmd_bpnp(args):
    """Dump the reference BPnP implicit-function gradients on a fixture.

    Builds seeded (pts3d, K, GT pose), projects + perturbs to get pts2d,
    solves PnP with the reference's cv2 path (bpnp_layers.py:88-117), then
    evaluates ``pnp_gradient_efficient`` (bpnp_layers.py:138-212) with a
    seeded upstream gradient. The JAX side evaluates its IFT vjp at the
    SAME P_6d so the comparison isolates the backward pass.

    Note the reference assembles its stationarity residual from the
    ALGEBRAIC (depth-scaled) reprojection error while the solver optimizes
    the geometric one; the two coincide as depth variation across points
    goes to zero, so the fixture keeps the object depth spread small
    (<2%) and the test band covers the residual difference.
    """
    _setup_env()
    import numpy as np

    from casapose.pose_estimation.bpnp_layers import pnp, pnp_gradient_efficient

    rng = np.random.default_rng(17)
    n, bs = args.points, args.batch
    K = np.array([[320.0, 0, 160.0], [0, 320.0, 120.0], [0, 0, 1.0]], np.float32)
    pts3d = rng.uniform(-0.004, 0.004, (n, 3)).astype(np.float32)  # ~1.6% depth spread at 0.5 m
    pts2d = np.zeros((bs, n, 2), np.float32)
    p6d = np.zeros((bs, 6), np.float32)
    for b in range(bs):
        rvec = rng.normal(0, 0.5, 3)
        t = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02), 0.5])
        import cv2

        Rm, _ = cv2.Rodrigues(rvec)
        cam = pts3d @ Rm.T + t
        uv = cam @ K.T
        clean = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        pts2d[b] = clean + rng.normal(0, args.noise, (n, 2)).astype(np.float32)
        p6d[b] = pnp(pts3d, pts2d[b], K).reshape(6)
    grad_out = rng.normal(0, 1.0, (bs, 6)).astype(np.float32)
    gx, gz, gK, _ = pnp_gradient_efficient(
        grad_out, pts2d, pts3d, K, p6d, batch_3d=False, batch_cam=False
    )
    np.savez(
        os.path.join(args.out, "bpnp_fixture.npz"),
        pts3d=pts3d, pts2d=pts2d, K=K, p6d=p6d, grad_out=grad_out,
        grad_pts2d=np.asarray(gx), grad_pts3d=np.asarray(gz), grad_K=np.asarray(gK),
    )
    print(json.dumps({"ok": True, "batch": bs, "points": n}))


def cmd_surgery(args):
    """Run the reference's weight-surgery path and dump the surgered net.

    Drives the ACTUAL copy functions inside train_casapose.py
    (:352-447: copy_weights_segmentation / copy_clade_weights /
    copy_weights_vertex) via runpy with ``--epochs 0`` (no training), then
    saves the surgered network from the script's globals. Only the copied
    slices are deterministic across frameworks (the rest is keras random
    init), so the fixture also records the backup h5 the copies came from.
    """
    import runpy
    import shutil

    ref = _setup_env()
    import numpy as np
    import tensorflow as tf

    from casapose.pose_models.tfkeras import Classifiers

    out = args.out
    ref_out = os.path.join(out, "ref_out")
    os.makedirs(os.path.join(ref_out, "frozen_model"), exist_ok=True)
    confidence_mode = args.mode == "confidence"
    n_backup_obj = 2
    n_obj = 2 if confidence_mode else 3
    objects = ",".join(f"obj_{i:06d}" for i in range(1, n_obj + 1))
    points = 9

    tf.random.set_seed(0)
    backup_ver = 2 * points + (0 if confidence_mode else points)
    backup = Classifiers.get(args.model)(
        ver_dim=backup_ver,
        seg_dim=1 + n_backup_obj,
        input_shape=(64, 64, 3),
        weights=None,
        base_model="resnet18",
        input_segmentation_shape=None,
    )
    _seed_weights(backup)
    backup.save_weights(os.path.join(out, "backup.h5"))
    shutil.copyfile(os.path.join(out, "backup.h5"), os.path.join(ref_out, "frozen_model", "weights.h5"))
    del backup
    tf.keras.backend.clear_session()

    import casapose.pose_models.models.resnet as ref_resnet

    ref_resnet.load_model_weights = lambda *a, **k: None
    if hasattr(tf.keras.optimizers, "legacy"):
        tf.keras.optimizers.Adam = tf.keras.optimizers.legacy.Adam

    csv = os.path.join(out, "objects_to_copy.csv")
    with open(csv, "w") as f:
        f.write("1,1\n2,2\n")

    argv = [
        os.path.join(ref, "train_casapose.py"),
        "--data", "", "--datatest", "",
        "--object", objects,
        "--modelname", args.model, "--backbonename", "resnet18",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", str(points),
        "--imagesize", "64", "64",
        "--epochs", "0", "--manualseed", "11",
        "--outf", ref_out, "--gpuids", "-1",
    ]
    if confidence_mode:
        argv += ["--copy_weights_add_confidence_maps", "1", "--load_h5_filename", "weights"]
    else:
        argv += [
            "--copy_weights_from_backup_network", "1", "--load_h5_filename", "weights",
            "--objects_in_input_network", str(n_backup_obj), "--objects_to_copy_list", csv,
        ]
    old_argv = sys.argv
    sys.argv = argv
    try:
        g = runpy.run_path(argv[0], run_name="__main__")
    finally:
        sys.argv = old_argv
    # bf16-truncate before save: the copied slices come from the bf16-clean
    # backup (rounding is idempotent on them — the parity tests compare ONLY
    # those slices, exactly), while the expanded net's fresh keras random
    # init gains 16 zero mantissa bits, halving the committed seed fixture.
    net = g["net"]
    for w in net.weights:
        a = w.numpy()
        if a.dtype == np.float32:
            w.assign((a.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32))
    net.save_weights(os.path.join(out, "surgered.h5"))
    print(json.dumps({"ok": True, "mode": args.mode, "objects": n_obj}))


def cmd_train(args):
    """Run the reference's ACTUAL training script on a synthetic scene.

    Generates a deterministic NDDS scene (tools/synthetic_scene.py), builds
    a seeded reference net, saves its h5, then executes
    ``/root/reference/train_casapose.py`` under runpy with augmentation
    disabled (identity imgaug stub, noise 0, rotation/translation 0,
    full-image crop) so every step is a deterministic function of the
    scene + h5. Per-step loss components land in
    ``<out>/ref_out/loss_train.csv`` — the cross-framework train parity
    fixture (reference train_casapose.py:40-145,494-691).

    The scene and the h5 stay in the fixture dir so the JAX side trains on
    the *same* files.
    """
    import runpy
    import shutil

    ref = _setup_env()
    import tensorflow as tf

    from synthetic_scene import OBJECTS, make_meshes, make_scene

    out = args.out
    mesh_root = os.path.join(out, "models")
    data_root = os.path.join(out, "data")
    ref_out = os.path.join(out, "ref_out")
    make_meshes(mesh_root)
    make_scene(os.path.join(data_root, "000000"), mesh_root, n_images=args.images)
    os.makedirs(os.path.join(ref_out, "frozen_model"), exist_ok=True)

    from casapose.pose_models.tfkeras import Classifiers

    tf.random.set_seed(0)
    seg_dim = 1 + len(OBJECTS)
    ver_dim = 2 * args.points + args.points  # confidence maps on
    net = Classifiers.get(args.model)(
        ver_dim=ver_dim,
        seg_dim=seg_dim,
        input_shape=(64, 64, 3),  # conv weights are input-size independent
        weights=None,
        base_model="resnet18",
        input_segmentation_shape=None,
    )
    _seed_weights(net)
    net.save_weights(os.path.join(out, "weights.h5"))
    shutil.copyfile(os.path.join(out, "weights.h5"), os.path.join(ref_out, "frozen_model", "weights.h5"))
    del net
    tf.keras.backend.clear_session()

    # Offline: skip the hard-coded weights="imagenet" download
    # (train_casapose.py:324-331); the full seeded h5 overwrites everything
    # right after (by_name load at :376).
    import casapose.pose_models.models.resnet as ref_resnet

    ref_resnet.load_model_weights = lambda *a, **k: None

    # The reference calls optimizer._decayed_lr (train_casapose.py:752), a
    # legacy-Optimizer-only method; point Adam at the legacy class (same
    # update rule: m,v accumulators + sqrt(1-b2^t)/(1-b1^t) bias-corrected
    # step with eps outside the sqrt).
    if hasattr(tf.keras.optimizers, "legacy"):
        tf.keras.optimizers.Adam = tf.keras.optimizers.legacy.Adam

    script = os.path.join(ref, "train_casapose.py")
    argv = [
        script,
        "--data", data_root, "--datatest", "", "--datameshes", mesh_root,
        "--object", ",".join(OBJECTS),
        "--modelname", args.model, "--backbonename", "resnet18",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", str(args.points),
        "--imagesize", "240", "320", "--crop_factor", "1.0",
        "--batchsize", str(args.images), "--epochs", str(args.steps),
        "--loginterval", "1", "--saveinterval", "1000", "--validationinterval", "1000",
        "--noise", "0.0", "--use_imgaug", "1", "--translation", "0", "--rotation", "0",
        "--lr", "0.001", "--lr_decay", "1.0",
        "--keypoint_loss_weight", "0.07",
        "--load_h5_weights", "1", "--load_h5_filename", "weights",
        "--train_vectors_with_ground_truth", "0",
        "--outf", ref_out, "--gpuids", "-1", "--workers", "1", "--prefetch", "1",
        "--manualseed", "3",
    ] + ([t for t in args.extra.split(",") if t] if args.extra else [])
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = old_argv
    assert os.path.exists(os.path.join(ref_out, "loss_train.csv"))
    print(json.dumps({"ok": True, "steps": args.steps}))


def cmd_batch(args):
    """Run many oracle jobs in ONE process (single TF import).

    ``--jobs`` is a JSON list of {"argv": [...], "out": dir}; each argv is
    re-parsed through the same CLI, so every subcommand is batchable. This
    is what keeps a cold parity-suite run tractable: the TF import +
    process startup (~15 s) is paid once instead of per fixture.
    """
    with open(args.jobs) as f:
        jobs = json.load(f)
    parser = build_parser()
    for job in jobs:
        sub_args = parser.parse_args(job["argv"] + ["--out", job["out"]])
        os.makedirs(job["out"], exist_ok=True)
        sub_args.func(sub_args)


def build_parser():
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

    ev = sub.add_parser("eval")
    ev.add_argument("--model", default="casapose_c_gcu5")
    ev.add_argument("--out", required=True)
    ev.add_argument("--images", type=int, default=3)
    ev.add_argument("--points", type=int, default=9)
    ev.add_argument("--coords", type=int, default=1)
    ev.add_argument("--confidence", type=int, default=1)
    ev.add_argument("--extra", default=None, help="extra reference eval flags, comma-joined")
    ev.add_argument("--weights-h5", default=None, help="evaluate an EXTERNAL Keras h5 (JAX-side export) instead of seeding one")
    ev.add_argument("--weights-sha", default=None, help="content hash of --weights-h5 (cache-key only)")
    ev.add_argument("--n-obj", type=int, default=0, help="scene object count (0 = legacy 2-object scene)")
    ev.set_defaults(func=cmd_eval)

    bp = sub.add_parser("bpnp")
    bp.add_argument("--out", required=True)
    bp.add_argument("--points", type=int, default=9)
    bp.add_argument("--batch", type=int, default=4)
    bp.add_argument("--noise", type=float, default=2.0)
    bp.set_defaults(func=cmd_bpnp)

    sg = sub.add_parser("surgery")
    sg.add_argument("--out", required=True)
    sg.add_argument("--model", default="casapose_c_gcu5")
    sg.add_argument("--mode", choices=["expand", "confidence"], default="expand")
    sg.set_defaults(func=cmd_surgery)

    r = sub.add_parser("ransac")
    r.add_argument("--out", required=True)
    r.add_argument("--height", type=int, default=96)
    r.add_argument("--width", type=int, default=128)
    r.add_argument("--objects", type=int, default=3)
    r.add_argument("--points", type=int, default=9)
    r.add_argument("--batch", type=int, default=2)
    r.add_argument("--hyps", type=int, default=128)
    r.add_argument("--inlier-thresh", type=float, default=0.99)
    r.add_argument("--max-iter", type=int, default=20)
    r.add_argument("--noise", type=float, default=0.0)
    r.set_defaults(func=cmd_ransac)

    t = sub.add_parser("train")
    t.add_argument("--model", default="casapose_c_gcu5")
    t.add_argument("--out", required=True)
    t.add_argument("--images", type=int, default=2)
    t.add_argument("--steps", type=int, default=3)
    t.add_argument("--points", type=int, default=9)
    t.add_argument(
        "--extra", default=None,
        help="extra reference train flags, comma-joined (argparse cannot nest option-like tokens)",
    )
    t.set_defaults(func=cmd_train)

    bt = sub.add_parser("batch")
    bt.add_argument("--jobs", required=True, help="JSON list of {argv, out}")
    bt.add_argument("--out", default=None)  # unused; per-job outs
    bt.set_defaults(func=cmd_batch)

    return p


def main():
    args = build_parser().parse_args()
    if args.out:
        os.makedirs(args.out, exist_ok=True)
    args.func(args)


if __name__ == "__main__":
    main()
