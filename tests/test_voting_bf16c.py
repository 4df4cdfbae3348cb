"""Accuracy of the centered-bf16 voting form (CASAPOSE_VOTING_FORM=bf16c).

VERDICT r4 item 6b: bf16 voting inputs halve the six contractions' operand
bytes and double MXU rate, but plain bf16 feats were measured to move voted
points by ~32 px (docs/DESIGN.md §7) — the q sums cancel at absolute
coordinate magnitude. The bf16c form centers pixel coordinates on the
per-class centroid before accumulation (exact shift of the normal
equations), so bf16 rounds a blob-radius-scale quantity instead.

This test quantifies the residual error against a float64 numpy oracle on a
synthetic worst-case scene (near-parallel directions: distant keypoint,
narrow blob — maximal R cancellation). It pins

  * the default ``multi`` f32 form at its contracted ~1e-3 px band, and
  * the ``bf16c`` form at sub-pixel error, ~an order better than plain
    bf16's measured tens-of-px failure.

The speed decision lives in docs/DESIGN.md §7 (on-chip measurement).
"""

import numpy as np
import pytest


def _f64_oracle(seg, dirs, conf, k):
    """Float64 weighted-LS voting, reference semantics (softplus weights,
    coords normalized by height, pinv solve)."""
    b, h, w, c = seg.shape
    oc = c - 1
    labels = seg.argmax(-1)
    out = np.zeros((b, oc, k, 2))
    wgt = np.logaddexp(conf.astype(np.float64), 0.0)
    n = dirs.astype(np.float64).reshape(b, h, w, k, 2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / h
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    for bi in range(b):
        for o in range(oc):
            m = labels[bi] == o + 1
            if not m.any():
                continue
            for ki in range(k):
                ny, nx = n[bi, :, :, ki, 0][m], n[bi, :, :, ki, 1][m]
                wk = wgt[bi, :, :, ki][m]
                a = wk * (1 - ny * ny)
                bq = wk * (-ny * nx)
                d = wk * (1 - nx * nx)
                R = np.array([[a.sum(), bq.sum()], [bq.sum(), d.sum()]])
                q = np.array(
                    [(a * cy[m] + bq * cx[m]).sum(), (bq * cy[m] + d * cx[m]).sum()]
                )
                out[bi, o, ki] = np.linalg.pinv(R) @ q * h
    return out


def _scene(seed=0, h=96, w=128, oc=3, k=5):
    """Synthetic worst case: small elliptical blobs whose pixels all point
    at keypoints OUTSIDE the blob (near-parallel directions => near-rank-1
    R), plus noise on the directions."""
    r = np.random.default_rng(seed)
    seg = np.zeros((1, h, w, 1 + oc), np.float32)
    seg[..., 0] = 1.0
    dirs = r.normal(size=(1, h, w, 2 * k)).astype(np.float32)
    conf = r.normal(size=(1, h, w, k)).astype(np.float32)
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / h
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    kps = np.zeros((oc, k, 2))
    for o in range(oc):
        oy, ox = r.uniform(0.25, 0.75), r.uniform(0.3, w / h - 0.3)
        m = ((cy - oy) ** 2 / 0.012 + (cx - ox) ** 2 / 0.02) < 1.0
        seg[0, :, :, o + 1][m] = 5.0
        seg[0, :, :, 0][m] = 0.0
        for ki in range(k):
            # keypoint up to ~2 blob radii away from the centroid
            kp = np.array([oy, ox]) + r.uniform(-0.2, 0.2, 2)
            kps[o, ki] = kp
            d = np.stack([kp[0] - cy, kp[1] - cx], -1)
            d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
            noise = r.normal(scale=0.02, size=d.shape)
            dm = d + noise
            dirs[0, :, :, 2 * ki][m] = dm[..., 0][m]
            dirs[0, :, :, 2 * ki + 1][m] = dm[..., 1][m]
    return seg, dirs, conf, kps


@pytest.mark.parametrize("form,bound", [("multi", 1e-3), ("bf16c", 1.0)])
def test_voting_form_accuracy(form, bound, monkeypatch):
    from casapose_tpu.ops.voting import ls_voting

    k = 5
    seg, dirs, conf, _ = _scene(seed=3, k=k)
    ref = _f64_oracle(seg, dirs, conf, k)
    monkeypatch.setenv("CASAPOSE_VOTING_FORM", form)
    ours = np.asarray(ls_voting(seg, dirs, conf, num_points=k))
    present = np.abs(ref).sum(-1) > 0
    d = np.abs(ours - ref)[present]
    assert d.max() < bound, f"{form}: max |dev| {d.max()} px vs f64 oracle"


def test_bf16c_beats_plain_bf16(monkeypatch):
    """The centering is what makes bf16 usable: plain bf16 operands on the
    same scene err at >= several px; centered bf16 stays sub-px."""
    import jax.numpy as jnp

    from casapose_tpu.ops import voting as V

    k = 5
    seg, dirs, conf, _ = _scene(seed=11, k=k)
    ref = _f64_oracle(seg, dirs, conf, k)
    present = np.abs(ref).sum(-1) > 0

    monkeypatch.setenv("CASAPOSE_VOTING_FORM", "bf16c")
    d_centered = np.abs(np.asarray(V.ls_voting(seg, dirs, conf, num_points=k)) - ref)[
        present
    ].max()

    # plain-bf16 comparison: same contraction, uncentered bf16 operands
    monkeypatch.setenv("CASAPOSE_VOTING_FORM", "multi")
    d_plain = np.abs(
        np.asarray(
            V.ls_voting(
                seg.astype(np.float32),
                jnp.asarray(dirs).astype(jnp.bfloat16).astype(jnp.float32),
                conf,
                num_points=k,
            )
        )
        - ref
    )[present].max()
    # direction quantization alone is mild; the killer is coordinate-scale
    # accumulation, which bf16c avoids. Assert the centered form is sub-px
    # and materially better than full-pipeline plain bf16 was measured to
    # be (32 px); the cheap proxy here only quantizes directions.
    assert d_centered < 1.0, d_centered
    print(f"bf16c max dev {d_centered:.4f} px; bf16-dirs-only proxy {d_plain:.4f} px")
