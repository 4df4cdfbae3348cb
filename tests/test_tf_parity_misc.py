"""Cross-framework parity: BPnP gradients + weight surgery.

VERDICT r2 items 6 and 9. Both fixtures come from the REFERENCE code run
by the oracle (tools/tf_reference_oracle.py ``bpnp`` / ``surgery``).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.join(REPO, "tools") not in sys.path:
    sys.path.insert(0, os.path.join(REPO, "tools"))
from oracle_cache import ensure_fixtures, oracle_skip  # noqa: E402

pytestmark = pytest.mark.slow


def _fixture(argv):
    try:
        return ensure_fixtures([argv])[0]
    except RuntimeError as e:
        oracle_skip(e)


def _rodrigues64(r):
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)


def _exact_ift_dx(p6d, pts2d, pts3d, K, g_out, tf_pinv=False):
    """Exact float64 IFT gradient d<g,pose>/d pts2d by finite differences.

    Independent of BOTH implementations under test: plain numpy, central
    differences of the geometric-SSE stationarity residual. With
    ``tf_pinv`` the Hessian inverse truncates singular values below
    tf.linalg.pinv's default f32 rcond (10 * max_dim * eps * smax) —
    modelling what the reference backward actually computes.
    """

    def sse(y, x2):
        cam = pts3d @ _rodrigues64(y[:3]).T + y[3:]
        uv = cam @ K.T
        d = uv[:, :2] / uv[:, 2:] - x2
        return np.sum(d * d)

    def f(y, x2):
        e, out = 1e-7, np.zeros(6)
        for i in range(6):
            yp, ym = y.copy(), y.copy()
            yp[i] += e
            ym[i] -= e
            out[i] = (sse(yp, x2) - sse(ym, x2)) / (2 * e)
        return out

    n = pts2d.shape[0]
    e = 1e-6
    H = np.zeros((6, 6))
    for i in range(6):
        yp, ym = p6d.copy(), p6d.copy()
        yp[i] += e
        ym[i] -= e
        H[:, i] = (f(yp, pts2d) - f(ym, pts2d)) / (2 * e)
    H = 0.5 * (H + H.T)
    Jfx = np.zeros((6, n, 2))
    for i in range(n):
        for j in range(2):
            xp, xm = pts2d.copy(), pts2d.copy()
            xp[i, j] += e
            xm[i, j] -= e
            Jfx[:, i, j] = (f(p6d, xp) - f(p6d, xm)) / (2 * e)
    U, S, Vt = np.linalg.svd(H)
    cutoff = 10 * 6 * np.finfo(np.float32).eps * S.max() if tf_pinv else 0.0
    Sinv = np.where(S > cutoff, np.where(S > 0, 1.0 / S, 0.0), 0.0)
    w = -((Vt.T * Sinv) @ U.T) @ g_out
    return np.einsum("i,inm->nm", w, Jfx)


def test_bpnp_gradient_parity():
    """Our custom_vjp vs the EXACT implicit-function gradient, plus a
    characterization of the reference's backward (bpnp_layers.py:138-212).

    Evaluated at the reference's own cv2-solved poses. Two findings this
    test pins down (measured, see PARITY.md):

      * ours matches the exact float64 IFT to ~1e-3 relative — after the
        Jacobi-equilibration fix to the damped Hessian solve (a
        trace-proportional damping previously distorted the soft
        translation directions by ~30%);
      * the reference does NOT compute the exact IFT: ``tf.linalg.pinv``'s
        default rcond (10·max_dim·eps_f32 ~ 6e-6 relative) truncates the
        pose Hessian's two soft translation singular values (sigma ~ 21
        and 25 vs sigma_max ~ 7e6), silently zeroing those gradient
        directions. Reproducing that truncation in float64 matches the
        reference dump to ~2% — so the deviation is understood exactly,
        not hand-waved.
    """
    import jax

    from casapose_tpu.pose.bpnp import _ift_vjp_single

    # small pixel noise keeps the reference's algebraic-residual assembly
    # within the pinv-truncation model (at larger residuals its
    # depth-weighting deviates too; see the oracle's cmd_bpnp docstring)
    fx = np.load(os.path.join(_fixture(["bpnp", "--noise", "0.05"]), "bpnp_fixture.npz"))
    g_out, p6d = fx["grad_out"], fx["p6d"]
    pts2d, pts3d, K = fx["pts2d"], fx["pts3d"], fx["K"]
    bs = p6d.shape[0]
    with jax.default_matmul_precision("float32"):
        d_x, _, _ = jax.vmap(_ift_vjp_single, in_axes=(0, 0, 0, None, None))(
            g_out, p6d, pts2d, pts3d, K
        )
    d_x = np.asarray(d_x)  # [bs, n, 2]

    def rel(a, b):
        return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)

    for b in range(bs):
        exact = _exact_ift_dx(
            p6d[b].astype(np.float64), pts2d[b].astype(np.float64),
            pts3d.astype(np.float64), K.astype(np.float64), g_out[b].astype(np.float64),
        )
        assert rel(d_x[b], exact) < 2e-2, f"[{b}] ours vs exact IFT: rel {rel(d_x[b], exact)}"

        # understand the reference exactly: exact IFT + tf-pinv truncation
        truncated = _exact_ift_dx(
            p6d[b].astype(np.float64), pts2d[b].astype(np.float64),
            pts3d.astype(np.float64), K.astype(np.float64), g_out[b].astype(np.float64),
            tf_pinv=True,
        )
        assert rel(fx["grad_pts2d"][b], truncated) < 0.10, (
            f"[{b}] reference no longer matches the pinv-truncation model: "
            f"rel {rel(fx['grad_pts2d'][b], truncated)}"
        )


def _surgery_models(meta_objects, confidence):
    from functools import partial

    import jax

    from casapose_tpu.models.registry import get_model

    points = 9
    ver_dim = 2 * points + (points if confidence else 0)
    model = get_model("casapose_c_gcu5", ver_dim=ver_dim, seg_dim=1 + meta_objects)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(1), x)
    return model, variables


def test_expansion_surgery_parity():
    """apply_expansion_surgery vs the reference's copy functions
    (train_casapose.py:424-447) driven through the real script.

    Only the copied slices are deterministic (the expanded net's other
    weights are fresh random init on both sides), so the comparison
    targets exactly what the surgery writes: seg-conv columns [0, 1, 2]
    and CLADE table rows [0, 1, 2] of pv_block_{6..10}.
    """
    import jax

    from casapose_tpu.core.checkpoint import apply_expansion_surgery, flatten_params, import_keras_h5

    out = _fixture(["surgery"])
    # reference surgered net (3 objects) + the backup it copied from (2)
    _, vars3 = _surgery_models(3, confidence=True)
    ref_vars, _, skipped = import_keras_h5(os.path.join(out, "surgered.h5"), jax.tree.map(np.copy, vars3))
    assert skipped == []
    _, vars2 = _surgery_models(2, confidence=True)
    backup_vars, _, skipped = import_keras_h5(os.path.join(out, "backup.h5"), jax.tree.map(np.copy, vars2))
    assert skipped == []

    objects_to_copy = np.array([[0, 0], [1, 1], [2, 2]], np.int32)  # incl. background
    ours = apply_expansion_surgery(vars3["params"], backup_vars["params"], objects_to_copy)

    ours_flat = flatten_params(ours)
    ref_flat = flatten_params(ref_vars["params"])
    rows = [0, 1, 2]
    seg_k = "pv_final_conv_segmentation/kernel"
    np.testing.assert_allclose(
        np.asarray(ours_flat[seg_k])[0, 0, :, rows], np.asarray(ref_flat[seg_k])[0, 0, :, rows],
        rtol=0, atol=0,
    )
    clade_keys = [k for k in ours_flat if "clade" in k.lower()]
    assert len(clade_keys) >= 10, f"expected 5 CLADE layers x 2 tables, got {clade_keys}"
    for k in clade_keys:
        np.testing.assert_allclose(
            np.asarray(ours_flat[k])[rows], np.asarray(ref_flat[k])[rows], rtol=0, atol=0,
            err_msg=k,
        )


def test_confidence_surgery_parity():
    """copy_weights_vertex vs the reference's confidence-map addition
    (train_casapose.py:401-409): first 18 vertex-conv columns copied."""
    import jax

    from casapose_tpu.core.checkpoint import copy_weights_vertex, flatten_params, import_keras_h5

    out = _fixture(["surgery", "--mode", "confidence"])
    _, vars_conf = _surgery_models(2, confidence=True)
    ref_vars, _, skipped = import_keras_h5(
        os.path.join(out, "surgered.h5"), jax.tree.map(np.copy, vars_conf)
    )
    assert skipped == []
    _, vars_nc = _surgery_models(2, confidence=False)
    backup_vars, _, skipped = import_keras_h5(
        os.path.join(out, "backup.h5"), jax.tree.map(np.copy, vars_nc)
    )
    assert skipped == []

    ver_dim = 18
    ours = copy_weights_vertex(vars_conf["params"], backup_vars["params"], ver_dim)
    k = "pv_final_conv_vertex/kernel"
    np.testing.assert_allclose(
        np.asarray(flatten_params(ours)[k])[0, 0, :, :ver_dim],
        np.asarray(flatten_params(ref_vars["params"])[k])[0, 0, :, :ver_dim],
        rtol=0, atol=0,
    )
