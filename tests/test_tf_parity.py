"""Cross-framework parity: the REFERENCE TensorFlow implementation as oracle.

Runs ``tools/tf_reference_oracle.py`` in a subprocess (TF on CPU, legacy
Keras) to build actual reference models with deterministically seeded
weights — including non-trivial BN moving statistics so a mis-mapped
statistic cannot hide — exports Keras h5, and asserts:

  * ``import_keras_h5`` places EVERY dataset of the reference export
    (zero skips) for every layer kind: conv / BN / CLADE (+ its nested
    parameter-free BN) / PartialConvolution (prepare- and shared-named,
    (ch,3,3,d)->HWIO) / trainable HalfSize;
  * our forward pass matches the reference activations within float32
    accumulation noise (the divergence profile is pure roundoff: it grows
    gradually with depth; a wrong mapping produces O(0.1+) errors);
  * ``ls_voting`` matches the reference's float64 ``CoordLSVotingWeighted``
    to ~1e-5 px, with and without the connected-component instance filter.

Matches VERDICT round-1 item 1 / SURVEY §7 step 3 (parity harness).
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
from oracle_cache import ensure_fixtures, oracle_skip  # noqa: E402

pytestmark = pytest.mark.slow

ZOO_VARIANTS = [
    "casapose_c_gcu5",  # flagship: partial conv + CLADE + guided ups
    "casapose_c",  # trainable HalfSize, no stop-gradient, plain 2x ups
    "casapose_c_gu",  # CLADE + guided ups, no partial conv
    "casapose_c_gcu3",  # partial conv on layers 1-3
    "casapose_c_gcu4",  # partial conv on layers 1-4
    "casapose_c_gcu5_sw5",  # cross-decoder shared PartialConvolutions
    "casapose_c_gcu4_sw1",  # shared layer 1 + partial conv 2-5
    "casapose_c_gcu5_sw1",  # shared layer 1, no decoder-2 skip concats
    "casapose_c_gcu4_bilat",  # guided *bilinear* upsampling
    "casapose_c_gcu4_sw2",  # shared layers 1-2 + partial conv 3-4
    "pvnet_combined",  # single-decoder baseline, fused final conv
]

CUSTOM_WIRING = "10000,11100,11110,10010,10000"


def _fwd_argv(model, size=64, objects=4, points=9, gt_seg=False, decoder_params=None):
    argv = [
        "forward", "--model", model,
        "--height", str(size), "--width", str(size),
        "--objects", str(objects), "--points", str(points),
    ]
    if gt_seg:
        argv.append("--gt-seg-input")
    if decoder_params:
        argv += ["--decoder-params", decoder_params]
    return argv


MODULE_FIXTURES = (
    [_fwd_argv(m) for m in ZOO_VARIANTS]
    + [
        _fwd_argv("casapose_c_gcu5", gt_seg=True),
        _fwd_argv("casapose_custom", decoder_params=CUSTOM_WIRING),
        ["backbone"],
        ["voting"],
        ["voting", "--filter"],
    ]
)


@pytest.fixture(scope="session")
def oracle_fixtures():
    """Build every fixture this module needs in ONE oracle subprocess.

    Disk-cached across sessions (tools/oracle_cache.py) — a warm run makes
    no subprocess at all; a cold run pays a single TF import instead of 17
    (VERDICT r2 weak #1: slow suite must finish < 20 min).
    """
    try:
        dirs = ensure_fixtures(MODULE_FIXTURES)
    except RuntimeError as e:  # TF oracle unusable in this environment
        oracle_skip(e)
    return {json.dumps(a): d for a, d in zip(MODULE_FIXTURES, dirs)}


def _fixture(oracle_fixtures, argv):
    out = oracle_fixtures[json.dumps(argv)]
    meta_path = os.path.join(out, "meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else None
    return out, meta


def _forward_fixture(oracle_fixtures, model, gt_seg=False, decoder_params=None):
    out, meta = _fixture(oracle_fixtures, _fwd_argv(model, gt_seg=gt_seg, decoder_params=decoder_params))
    fx = np.load(os.path.join(out, "fixture.npz"))
    return out, meta, fx


def _import_and_run(out, meta, fx, gt_seg=False):
    from functools import partial

    import jax

    from casapose_tpu.core.checkpoint import import_keras_h5
    from casapose_tpu.models.registry import get_model

    model = get_model(meta["model"], ver_dim=meta["ver_dim"], seg_dim=meta["seg_dim"])
    x = fx["input"]
    kwargs = {"gt_seg": fx["gt_seg"]} if gt_seg else {}
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), x, **kwargs)
    variables, loaded, skipped = import_keras_h5(os.path.join(out, "weights.h5"), variables)
    ours = np.asarray(jax.jit(partial(model.apply, train=False))(variables, x, **kwargs))
    return ours, loaded, skipped, meta["n_weights"]


def _phantom_member_pixels(ref_seg):
    """Pixels affected by the reference's sub-saturation partial-conv quirk.

    The reference's masked PartialConvolution normalizes by
    ``count_nonzero`` of the *soft* hard-softmax mask patch
    (`/root/reference/casapose/pose_models/models/_normalization_layers.py:345-352`):
    a 3x3 neighbor whose logit gap to the center's argmax class is below
    ~88/1e6 keeps a nonzero (~e-8) softmax mass after the x*1e6 scaling and
    is COUNTED as a member, shifting the 9/count renormalization by a whole
    discrete step. Our partial conv counts exact argmax members (the
    documented deviation in PARITY.md) — identical except on this
    measure-zero set, which random fixture weights can hit (observed: one
    64x64 sw5 pixel with a neighbor gap of 1.7e-5 -> count 3 vs 2 ->
    O(100) output diff on O(600) random-weight activations).

    Returns (affected_full_res [b,h,w] bool, n_lowres) where n_lowres is
    the number of quirk pixels at the HalfSize resolutions (those spread
    spatially through later convs and cannot be excluded pointwise).
    """
    def affected(seg):
        b, h, w, _ = seg.shape
        lm = seg.max(-1, keepdims=True)
        gap = lm - seg
        phantom = (gap > 0) & (gap * 1e6 < 104.0)  # nonzero f32 softmax mass (incl. denormals)
        am = seg.argmax(-1)
        ph = np.pad(phantom, ((0, 0), (1, 1), (1, 1), (0, 0)))
        aff = np.zeros((b, h, w), bool)
        for di in range(3):
            for dj in range(3):
                sl = ph[:, di : di + h, dj : dj + w, :]
                aff |= np.take_along_axis(sl, am[..., None], -1)[..., 0]
        return aff

    full = affected(ref_seg)
    n_lowres = 0
    seg = ref_seg
    for _ in range(3):  # HalfSize pyramid: stride-2 top-left subsample
        seg = seg[:, ::2, ::2, :]
        n_lowres += int(affected(seg).sum())
    return full, n_lowres


@pytest.mark.parametrize("model", ZOO_VARIANTS)
def test_forward_parity(oracle_fixtures, model):
    out, meta, fx = _forward_fixture(oracle_fixtures, model)
    ours, loaded, skipped, n_weights = _import_and_run(out, meta, fx)
    assert skipped == [], f"unmapped reference datasets: {skipped}"
    assert loaded == n_weights
    ref = fx["output"]
    assert ours.shape == ref.shape
    seg_dim = meta["seg_dim"]
    d = np.abs(ours - ref)
    # Segmentation logits drive every metric downstream: tight bound.
    assert d[..., :seg_dim].max() < 2e-3, f"seg logits diverge: {d[..., :seg_dim].max()}"
    # Full-res phantom-member quirk pixels (see _phantom_member_pixels) are
    # excluded from the vertex comparison: the reference's count_nonzero
    # renormalization intentionally differs there. Divergence at full res
    # stays pointwise (the level-5 partial conv is the last spatial op
    # before the 1x1 heads); low-res quirk pixels would spread, so their
    # presence fails loudly — regenerate the fixture draw if ever hit.
    aff, n_lowres = _phantom_member_pixels(ref[..., :seg_dim])
    assert n_lowres == 0, (
        f"{n_lowres} phantom-member quirk pixels at HalfSize resolutions — "
        "fixture draw unusable for pointwise comparison, regenerate"
    )
    assert aff.sum() <= 8, f"{aff.sum()} full-res quirk pixels — fixture draw degenerate"
    keep = ~aff
    dv = d[..., seg_dim:][keep]
    # Vertex fields accumulate roundoff through ~30 layers; the mean must
    # stay at float32-noise level and the max in the roundoff tail. (The
    # casapose_c fixture amplifies noise the most: its randomly-seeded
    # trainable HalfSize makes the mask pyramid dense, so CLADE mixes all
    # class tables per pixel; verified layer-by-layer to grow smoothly.)
    assert dv.mean() < 1e-3, f"vertex mean diff: {dv.mean()}"
    assert dv.max() < 5e-2, f"vertex max diff: {dv.max()}"
    # The argmax mask (what voting/CLADE consume) must agree everywhere
    # except genuine near-ties.
    flips = (np.argmax(ours[..., :seg_dim], -1) != np.argmax(ref[..., :seg_dim], -1)).mean()
    assert flips < 1e-3


def test_forward_parity_gt_seg_input(oracle_fixtures):
    """train_vectors_with_ground_truth mode: GT mask conditions decoder 2."""
    out, meta, fx = _forward_fixture(oracle_fixtures, "casapose_c_gcu5", gt_seg=True)
    ours, loaded, skipped, n_weights = _import_and_run(out, meta, fx, gt_seg=True)
    assert skipped == []
    assert loaded == n_weights
    ref = fx["output"]
    d = np.abs(ours - ref)
    assert d[..., : meta["seg_dim"]].max() < 2e-3
    # Random per-pixel GT labels put a class edge at every pixel — the
    # adversarial case for partial conv / guided upsampling roundoff.
    assert d[..., meta["seg_dim"] :].mean() < 2e-3
    assert d[..., meta["seg_dim"] :].max() < 5e-2


def test_casapose_custom_decoder_params_parity(oracle_fixtures):
    """casapose_custom with non-default per-layer wiring matches the
    reference's generic CASAPose(layer_params, ...) builder, and differs
    from gcu5 (VERDICT round-1 item 7)."""
    from functools import partial

    import jax

    from casapose_tpu.core.checkpoint import import_keras_h5
    from casapose_tpu.models.registry import get_model

    # Not the gcu5 wiring: CLADE everywhere, partial conv only on layers
    # 2-3, bilinear guided upsampling, no plain guided ups on layer 3.
    wiring = CUSTOM_WIRING
    out, meta, fx = _forward_fixture(oracle_fixtures, "casapose_custom", decoder_params=wiring)

    model = get_model("casapose_custom", ver_dim=meta["ver_dim"], seg_dim=meta["seg_dim"], decoder_params=wiring)
    x = fx["input"]
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), x)
    variables, loaded, skipped = import_keras_h5(os.path.join(out, "weights.h5"), variables)
    assert skipped == [], f"unmapped: {skipped}"
    assert loaded == meta["n_weights"]
    ours = np.asarray(jax.jit(partial(model.apply, train=False))(variables, x))
    d = np.abs(ours - fx["output"])
    sd = meta["seg_dim"]
    assert d[..., :sd].max() < 2e-3
    assert d[..., sd:].mean() < 1e-3 and d[..., sd:].max() < 5e-2

    # Distinguishable from gcu5: identical parameter names (the layer
    # naming scheme is shared) but different wiring — same weights through
    # the gcu5 graph give a different vertex output.
    gcu5 = get_model("casapose_c_gcu5", ver_dim=meta["ver_dim"], seg_dim=meta["seg_dim"])
    v5 = jax.jit(partial(gcu5.init, train=False))(jax.random.PRNGKey(0), x)
    v5, _, _ = import_keras_h5(os.path.join(out, "weights.h5"), v5)
    gcu5_out = np.asarray(jax.jit(partial(gcu5.apply, train=False))(v5, x))
    assert np.abs(gcu5_out[..., sd:] - ours[..., sd:]).max() > 0.1


def test_imagenet_backbone_import(oracle_fixtures):
    """Backbone-only h5 (qubvel ImageNet layout) initializes our backbone.

    VERDICT round-1 item 2: imported-vs-random activations differ and the
    imported backbone matches the TF backbone on a fixed input.
    """
    from functools import partial

    import jax

    from casapose_tpu.core.checkpoint import load_imagenet_backbone
    from casapose_tpu.models.resnet import ResNetBackbone

    out, _ = _fixture(oracle_fixtures, ["backbone"])
    fx = np.load(os.path.join(out, "backbone_fixture.npz"))
    bb = ResNetBackbone("resnet18")
    x = fx["input"]
    variables = jax.jit(partial(bb.init, train=False))(jax.random.PRNGKey(0), x)
    random_feats = [np.asarray(o) for o in bb.apply(variables, x, train=False)]
    v2, n = load_imagenet_backbone(variables, "resnet18", path=os.path.join(out, "backbone.h5"))
    assert n == 96  # every dataset of the reference resnet18 export
    feats = [np.asarray(o) for o in bb.apply(v2, x, train=False)]
    for i in range(5):
        d = np.abs(feats[i] - fx[f"feat{i}"])
        assert d.max() < 1e-3, f"feat{i} diverges: {d.max()}"
        # imported-vs-random must actually differ (the import took effect)
        assert np.abs(random_feats[i] - fx[f"feat{i}"]).max() > 0.1


def test_imagenet_env_override(oracle_fixtures, monkeypatch):
    """$CASAPOSE_IMAGENET_H5 short-circuits cache/download resolution."""
    from casapose_tpu.core.checkpoint import find_imagenet_h5

    out, _ = _fixture(oracle_fixtures, ["backbone"])
    monkeypatch.setenv("CASAPOSE_IMAGENET_H5", os.path.join(out, "backbone.h5"))
    assert find_imagenet_h5("resnet18") == os.path.join(out, "backbone.h5")
    assert find_imagenet_h5("not_a_model") is None


@pytest.mark.parametrize("filt", [False, True])
def test_ls_voting_parity(oracle_fixtures, filt):
    from casapose_tpu.ops.voting import ls_voting

    out, _ = _fixture(oracle_fixtures, ["voting"] + (["--filter"] if filt else []))
    fx = np.load(os.path.join(out, "voting_fixture.npz"))
    ours = np.asarray(
        ls_voting(fx["seg"], fx["dirs"], fx["conf"], num_points=9, filter_estimates=bool(fx["filter"]))
    )
    d = np.abs(ours - fx["output"])
    assert d.max() < 1e-3, f"voting diverges from float64 reference: {d.max()} px"
