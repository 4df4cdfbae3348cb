"""Cross-framework TRAIN-step parity vs the reference's actual training.

The oracle ``train`` command (tools/tf_reference_oracle.py) executes the
REFERENCE ``train_casapose.py`` under runpy on a deterministic synthetic
scene — identity augmentation, zero noise, full-image crop, seeded h5 init,
legacy-Adam optimizer — and records per-step loss components. This test
runs OUR ``run_training`` on the *same* scene with the *same* h5 and
asserts the per-step ``loss_train.csv`` components agree.

What this pins down that the eval-harness parity cannot: the training-mode
forward (BatchNorm batch statistics), ``compute_loss`` semantics
(train_casapose.py:40-145) including ``filter_high_proxy_errors`` /
``filter_vertex_with_segmentation``, the keypoint-reprojection loss in
training mode (estimate_poses=False — PnP-free), the BPnP reprojection
variant, gradient flow, and the legacy-Adam update rule across steps
(core/optimizer.py): a wrong gradient ANYWHERE shifts the step-2/3 losses.

VERDICT r2 item 1.
"""

import csv
import json
import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
from oracle_cache import ensure_fixtures, oracle_skip  # noqa: E402

pytestmark = pytest.mark.slow

STEPS = 3

# Variant name -> extra reference/our train flags (VERDICT r2 item 1 list).
VARIANTS = {
    "default": [],
    "filter_proxy": ["--filter_high_proxy_errors", "1"],
    "filter_vertex": ["--filter_vertex_with_segmentation", "1"],
    "bpnp": ["--use_bpnp_reprojection_loss", "1"],
}


def _train_argv(extra, steps=STEPS):
    argv = ["train", "--steps", str(steps)]
    if extra:
        # --extra=VALUE form: the value starts with '-', which argparse
        # would otherwise read as an option.
        argv += ["--extra=" + ",".join(extra)]
    return argv


def _train_fixture(variant):
    # One oracle subprocess per variant (disk-cached): the reference train
    # run dominates the cost, and a fresh process isolates repeated runpy
    # executions of train_casapose.py from each other.
    try:
        return ensure_fixtures([_train_argv(VARIANTS[variant])], timeout=1200)[0]
    except RuntimeError as e:
        oracle_skip(e)


def _read_losses(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return np.array(
        [
            [float(r["loss"]), float(r["mask_loss"]), float(r["vertex_loss"]),
             float(r["proxy_loss"]), float(r["keypoint_loss"])]
            for r in rows
        ]
    )


def _our_flags(fixture, outf, extra):
    # Mirrors the oracle's reference argv (tf_reference_oracle.cmd_train)
    # minus reference-only flags; augmentation must be identity on both
    # sides (reference: identity imgaug stub; ours: zero-range jitter).
    return [
        "--data", os.path.join(fixture, "data"),
        "--datatest", "",
        "--datameshes", os.path.join(fixture, "models"),
        "--object", "obj_000001,obj_000002",
        "--modelname", "casapose_c_gcu5", "--backbonename", "resnet18",
        "--estimate_confidence", "1", "--estimate_coords", "1", "--no_points", "9",
        "--imagesize", "240", "320", "--crop_factor", "1.0",
        "--batchsize", "2", "--epochs", str(STEPS),
        "--loginterval", "1", "--saveinterval", "1000", "--validationinterval", "1000",
        "--noise", "0.0", "--use_imgaug", "0",
        "--brightness", "0.0", "--contrast", "0.0", "--saturation", "0.0", "--hue", "0.0",
        "--translation", "0", "--rotation", "0",
        "--lr", "0.001", "--lr_decay", "1.0",
        "--keypoint_loss_weight", "0.07",
        "--load_h5_weights", "1", "--load_h5_filename", "weights",
        "--train_vectors_with_ground_truth", "0",
        "--pretrained", "0",
        "--outf", outf, "--workers", "1", "--prefetch", "1", "--manualseed", "3",
    ] + extra


@pytest.mark.parametrize("variant", list(VARIANTS.keys()))
def test_train_step_parity(variant, tmp_path):
    from casapose_tpu.train import run_training
    from casapose_tpu.utils.config import parse_config

    fixture = _train_fixture(variant)
    ref = _read_losses(os.path.join(fixture, "ref_out", "loss_train.csv"))
    assert ref.shape == (STEPS, 5)

    outf = str(tmp_path / "our_out")
    os.makedirs(os.path.join(outf, "frozen_model"), exist_ok=True)
    shutil.copyfile(
        os.path.join(fixture, "weights.h5"), os.path.join(outf, "frozen_model", "weights.h5")
    )
    opt = parse_config(_our_flags(fixture, outf, VARIANTS[variant]))
    run_training(opt)
    ours = _read_losses(os.path.join(outf, "loss_train.csv"))
    assert ours.shape == ref.shape

    # Step 1 is pure forward+loss parity (identical weights on both sides):
    # tight bands — observed agreement is 1e-6..1e-4 relative. The bpnp
    # variant's keypoint loss embeds a pose solve (host cv2 vs on-device
    # EPnP+LM on garbage voted coords -> different clamped local minima;
    # observed ~6%), so it gets looser kp AND total bands (the total
    # inherits the kp difference through its 0.07 weight).
    kp1_tol, total1_tol = (0.10, 0.03) if variant == "bpnp" else (2e-3, 2e-3)
    rel1 = np.abs(ours[0] - ref[0]) / np.maximum(np.abs(ref[0]), 1e-6)
    assert rel1[1:4].max() < 2e-3, (
        f"{variant} step-1 forward/loss parity: ours {ours[0]} vs ref {ref[0]} (rel {rel1})"
    )
    assert rel1[0] < total1_tol, f"{variant} step-1 total loss: rel {rel1[0]}"
    assert rel1[4] < kp1_tol, f"{variant} step-1 keypoint loss: rel {rel1[4]}"

    # Steps 2-3 fold in gradient + Adam-update parity. Adam's first steps
    # are near sign(g)*lr: parameters whose true gradient sits at f32
    # roundoff step in OPPOSITE directions across frameworks, so exact
    # multi-step tracking is unattainable at f32 — the same drift occurs
    # TF-vs-TF across BLAS builds. Observed drift here is <2.3% by step 3;
    # the band catches systematic gradient errors (which shift losses at
    # 10-100% immediately) while tolerating roundoff chaos. The per-tensor
    # updated-WEIGHT comparison below is the tight gradient check.
    rel = np.abs(ours[1:] - ref[1:]) / np.maximum(np.abs(ref[1:]), 1e-6)
    tol = 0.25 if variant == "bpnp" else 0.08
    assert rel.max() < tol, (
        f"{variant} steps 2-3 diverge: ours {ours[1:]} vs ref {ref[1:]} (rel {rel})"
    )


def test_one_step_weight_parity(tmp_path):
    """Per-parameter gradient parity via the updated weights after 1 step.

    The reference saves ``result_w.h5`` after the first epoch
    (train_casapose.py:900-903); importing it through the same name mapping
    as the init h5 gives every updated reference tensor. One legacy-Adam
    step moves each parameter by about ±lr·sign(g), so a systematically
    wrong gradient (sign, scale, or wiring) displaces WHOLE tensors by
    ~2·lr and fails the quantile bound; roundoff-level gradient noise only
    flips isolated near-zero-gradient entries.
    """
    import jax

    from casapose_tpu.core.checkpoint import import_keras_h5
    from casapose_tpu.train import run_training
    from casapose_tpu.utils.config import parse_config

    try:
        fixture = ensure_fixtures(
            [_train_argv(["--saveinterval", "1"], steps=1)], timeout=1200
        )[0]
    except RuntimeError as e:
        oracle_skip(e)
    ref_w = os.path.join(fixture, "ref_out", "frozen_model", "result_w.h5")
    assert os.path.exists(ref_w), "reference did not save post-step weights"

    outf = str(tmp_path / "our_out")
    os.makedirs(os.path.join(outf, "frozen_model"), exist_ok=True)
    shutil.copyfile(
        os.path.join(fixture, "weights.h5"), os.path.join(outf, "frozen_model", "weights.h5")
    )
    opt = parse_config(_our_flags(fixture, outf, []))
    opt.epochs = 1
    state = run_training(opt)

    ours = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    ref_vars, loaded, skipped = import_keras_h5(ref_w, jax.tree.map(np.zeros_like, ours))
    assert skipped == []
    lr = 1e-3
    flat_ours = jax.tree_util.tree_leaves_with_path(ours)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_vars))
    n_big_total = n_total = 0
    for path, a in flat_ours:
        b = flat_ref[path]
        d = np.abs(np.asarray(a) - np.asarray(b)).ravel()
        # every entry moved at most ~2*lr apart (opposite full Adam steps)
        assert d.max() < 3 * lr, f"{jax.tree_util.keystr(path)}: max dev {d.max()}"
        # A systematic gradient error (sign/scale/wiring) shifts MOST of a
        # tensor by ~2*lr: the median lands near 2*lr and the big-deviation
        # fraction near 100%. Cross-framework reduction roundoff only flips
        # near-zero-gradient entries (measured: worst tensor is an early BN
        # bias, whose gradient is a batch*H*W-sized sum, at ~2.5% flips).
        med = float(np.median(d))
        assert med < 0.2 * lr, f"{jax.tree_util.keystr(path)}: median dev {med}"
        n_big = int((d > lr).sum())
        n_big_total += n_big
        n_total += d.size
        # count floor: BN bias vectors are small (64-512) and their
        # gradients are batch*H*W-sized sums, so they carry the most
        # near-zero entries (measured: up to ~14 flips); a systematic
        # error flips ~the whole tensor.
        assert n_big <= max(20, 0.05 * d.size), (
            f"{jax.tree_util.keystr(path)}: {n_big}/{d.size} entries deviate > lr "
            f"(systematic gradient mismatch)"
        )
    # Globally, flips must stay the minority phenomenon they are: measured
    # 1.8% (the same f32 accumulation drift the forward-parity tests see
    # at 1e-4..5e-2 through 30 layers, mirrored into the gradients). A
    # systematic gradient error moves this to ~100%.
    assert n_big_total / n_total < 0.03, f"{n_big_total}/{n_total} entries deviate > lr"


def test_train_fixture_metadata():
    """The oracle actually ran the reference training to completion."""
    fixture = _train_fixture("default")
    assert os.path.exists(os.path.join(fixture, "weights.h5"))
    assert os.path.exists(os.path.join(fixture, "data", "000000", "000000.json"))
    argv = json.load(open(os.path.join(fixture, ".argv.json")))
    assert argv[0] == "train"
