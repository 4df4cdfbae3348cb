"""Fused Pallas voting accumulation vs the XLA formulation."""

import numpy as np
import pytest

from casapose_tpu.ops.voting import ls_voting
from casapose_tpu.ops.voting_kernel import voting_accumulate_pallas


def _inputs(seed=0, b=2, h=48, w=64, oc=4, k=9):
    rng = np.random.default_rng(seed)
    seg = rng.normal(0, 0.5, (b, h, w, 1 + oc)).astype(np.float32)
    seg[..., 0] += 1.0
    for o in range(oc):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        seg[:, cy - 6 : cy + 6, cx - 6 : cx + 6, o + 1] += 4.0
    dirs = rng.normal(size=(b, h, w, 2 * k)).astype(np.float32)
    conf = rng.normal(size=(b, h, w, k)).astype(np.float32)
    raw = np.concatenate([seg, dirs, conf], axis=-1)
    return seg, dirs, conf, raw


def test_kernel_accumulation_matches_xla_sums():
    """S = sum_p w*[a,b,d,qy,qx,1] per class: kernel (interpret mode) vs a
    numpy reference."""
    seg, dirs, conf, raw = _inputs()
    b, h, w, c = seg.shape
    oc, k = c - 1, 9
    labels = np.argmax(seg, axis=-1).astype(np.int32)

    S = np.asarray(voting_accumulate_pallas(raw, labels, c, k, interpret=True))

    # numpy oracle
    n = dirs.reshape(b, h, w, k, 2).astype(np.float64)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.divide(n, norm, out=np.zeros_like(n), where=norm > 0)
    ny, nx = n[..., 0], n[..., 1]
    wgt = np.logaddexp(conf.astype(np.float64), 0.0)
    a = (1 - ny * ny) * wgt
    bb = (-ny * nx) * wgt
    d = (1 - nx * nx) * wgt
    cy = ((np.arange(h) + 0.5) / h)[None, :, None, None]
    cx = ((np.arange(w) + 0.5) / h)[None, None, :, None]
    qy = a * cy + bb * cx
    qx = bb * cy + d * cx
    feats = np.stack([a, bb, d, qy, qx, wgt], axis=-1)  # [b,h,w,k,6]
    expected = np.zeros((b, oc, k, 6))
    for o in range(oc):
        m = (labels == o + 1)[..., None, None]
        expected[:, o] = (feats * m).sum(axis=(1, 2))
    np.testing.assert_allclose(S, expected, rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("filt", [False, True])
def test_ls_voting_raw_output_path_matches(filt, monkeypatch):
    """ls_voting(raw_output=...) == the sliced XLA path (CPU: the kernel
    gate falls back automatically; force interpret to exercise it)."""
    seg, dirs, conf, raw = _inputs(seed=3)
    ref = np.asarray(ls_voting(seg, dirs, conf, num_points=9, filter_estimates=filt))

    # On CPU the raw_output gate falls back to XLA — same result trivially;
    # exercise the kernel explicitly via interpret mode instead.
    import jax.numpy as jnp

    from casapose_tpu.ops.voting import _pinv_2x2_solve, instance_filter_mask

    labels = np.argmax(seg, axis=-1).astype(np.int32)
    if filt:
        hot = (labels[..., None] == np.arange(1, seg.shape[-1])[None, None, None]).astype(np.float32)
        keep = np.asarray(instance_filter_mask(hot > 0.5, 50, False, downsample=4))
        labels = np.where((hot * keep).sum(-1) > 0.5, labels, 0).astype(np.int32)
    S6 = voting_accumulate_pallas(raw, labels, seg.shape[-1], 9, interpret=True)
    mass = jnp.maximum(S6[..., 5], 1e-20)
    py, px = _pinv_2x2_solve(
        S6[..., 0] / mass, S6[..., 1] / mass, S6[..., 2] / mass, S6[..., 3] / mass, S6[..., 4] / mass
    )
    pts = np.asarray(jnp.stack([py, px], axis=-1)) * seg.shape[1]
    np.testing.assert_allclose(pts, ref, rtol=1e-4, atol=5e-3)
