"""RANSAC keypoint voting, fully batched with static shapes.

Rebuild of the PVNet-style hypothesis voting
(casapose/pose_estimation/ransac_voting.py:197-484). The reference nests
``tf.map_fn`` over batch and classes around data-dependent control flow
(``tf.where`` coordinate extraction, adaptive confidence exit). On TPU all
of that becomes masked fixed-size computation:

  * the variable-size foreground pixel set becomes a fixed-size candidate
    set selected with noisy top-k (validity-masked; doubles as the
    reference's random 30000-pixel downsample);
  * hypothesis generation samples candidate indices with a PRNG key;
  * inlier voting is a chunked [candidates x hypotheses] computation with
    no data-dependent shapes;
  * the adaptive while-loop becomes a fixed-length ``lax.scan`` whose
    updates are masked once the RANSAC confidence 1-(1-q^2)^N clears the
    threshold — the same results as the reference's data-dependent exit
    (ransac_voting.py:318-347) with static shapes; ``max_iter`` defaults
    to the reference's 20 via the eval path's ``ransac_rounds``.

Final refinement is the same inlier-weighted least squares with an
invertibility guard.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from casapose_tpu.core.numerics import divide_no_nan, f32_precision


def _select_candidates(mask, max_num, key):
    """Pick up to ``max_num`` foreground pixels as a fixed-size set.

    Returns (coords [N, 2] (x, y) +0.5, valid [N] float, idx [N]).
    Foreground pixels get top priority with random tie-breaking, which
    reproduces the reference's uniform downsampling when the foreground
    exceeds ``max_num``.
    """
    h, w = mask.shape
    flat = mask.reshape(-1)
    noise = jax.random.uniform(key, flat.shape)
    scores = flat * 2.0 + noise
    # The reference only downsamples when foreground exceeds max_num
    # (ransac_voting.py:295-301); a candidate set can never exceed the
    # image itself.
    _, idx = lax.top_k(scores, min(max_num, flat.shape[0]))
    valid = flat[idx]
    ys = (idx // w).astype(jnp.float32) + 0.5
    xs = (idx % w).astype(jnp.float32) + 0.5
    return jnp.stack([xs, ys], axis=1), valid, idx


def _ransac_single(mask, vertex, key, round_hyp_num, inlier_thresh, max_iter, min_num, max_num, confidence=0.99):
    """RANSAC voting for one (image, class) pair.

    mask: [h, w] float; vertex: [h, w, vn, 2] (dy, dx) fields.
    Returns [vn, 2] (x, y) voted points (zeros when foreground < min_num).
    """
    h, w, vn, _ = vertex.shape
    k_sel, k_hyp = jax.random.split(key)
    coords, valid, idx = _select_candidates(mask, max_num, k_sel)
    n = coords.shape[0]
    fg_count = jnp.sum(mask)

    direct = vertex.reshape(-1, vn, 2)[idx][:, :, ::-1]  # (dy,dx) -> (dx,dy)
    direct = direct * valid[:, None, None]

    def one_round(carry, inputs):
        all_win_ratio, all_win_pts, done = carry
        key_r, round_idx = inputs
        # Sample pairs of candidate indices, biased to valid ones by
        # sampling from the valid-count prefix (top-k puts them first).
        valid_n = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
        idxs = jax.random.randint(key_r, (round_hyp_num, vn, 2), 0, valid_n)
        c_s = coords[idxs]  # [hn, vn, 2, 2]
        d_s = direct[idxs, jnp.arange(vn)[None, :, None]]  # [hn, vn, 2, 2]
        det = d_s[:, :, 1, 0] * d_s[:, :, 0, 1] - d_s[:, :, 1, 1] * d_s[:, :, 0, 0]
        u = divide_no_nan(
            (c_s[:, :, 1, 1] - c_s[:, :, 0, 1]) * d_s[:, :, 1, 0]
            - (c_s[:, :, 1, 0] - c_s[:, :, 0, 0]) * d_s[:, :, 1, 1],
            det,
        )
        hyp = c_s[:, :, 0] + d_s[:, :, 0] * u[..., None]  # [hn, vn, 2]
        hyp = jnp.where(jnp.abs(det)[..., None] > 1e-6, hyp, 0.0)

        counts = _vote(coords, direct, valid, hyp, inlier_thresh)  # [hn, vn]
        win_idx = jnp.argmax(counts, axis=0)  # [vn]
        win_counts = jnp.max(counts, axis=0)
        win_pts = hyp[win_idx, jnp.arange(vn)]  # [vn, 2]
        win_ratio = win_counts / jnp.maximum(jnp.sum(valid), 1.0)
        # Adaptive-confidence semantics (ransac_voting.py:318-347): once
        # the RANSAC success probability 1-(1-q^2)^N clears ``confidence``,
        # later rounds stop contributing — identical results to the
        # reference's data-dependent loop exit, in fixed-shape form.
        better = (all_win_ratio < win_ratio) & ~done
        all_win_pts = jnp.where(better[:, None], win_pts, all_win_pts)
        all_win_ratio = jnp.where(better, win_ratio, all_win_ratio)
        hyp_total = (round_idx + 1).astype(jnp.float32) * round_hyp_num
        min_ratio = jnp.min(all_win_ratio)
        done = done | ((1.0 - (1.0 - min_ratio**2.0) ** hyp_total) > confidence)
        return (all_win_ratio, all_win_pts, done), None

    keys = jax.random.split(k_hyp, max_iter)
    (ratios, win_pts, _), _ = lax.scan(
        one_round,
        (jnp.zeros(vn), jnp.zeros((vn, 2)), jnp.bool_(False)),
        (keys, jnp.arange(max_iter)),
    )

    # Inlier-weighted LS refinement.
    inlier = _inliers(coords, direct, valid, win_pts, inlier_thresh)  # [n, vn]
    normal = direct[:, :, ::-1] * jnp.asarray([1.0, -1.0])  # rotate 90deg
    normal = normal * inlier[..., None]
    bvec = jnp.sum(normal * coords[:, None, :], axis=2)  # [n, vn]
    ATA = jnp.einsum("nvi,nvj->vij", normal, normal, precision=lax.Precision.HIGHEST)
    ATb = jnp.einsum("nvi,nv->vi", normal, bvec, precision=lax.Precision.HIGHEST)
    det = ATA[:, 0, 0] * ATA[:, 1, 1] - ATA[:, 0, 1] * ATA[:, 1, 0]
    trace = ATA[:, 0, 0] + ATA[:, 1, 1]
    ok = det > 1e-6 * jnp.maximum(trace, 1e-12) ** 2
    safe_det = jnp.where(ok, det, 1.0)
    refined = jnp.stack(
        [
            (ATA[:, 1, 1] * ATb[:, 0] - ATA[:, 0, 1] * ATb[:, 1]) / safe_det,
            (-ATA[:, 1, 0] * ATb[:, 0] + ATA[:, 0, 0] * ATb[:, 1]) / safe_det,
        ],
        axis=1,
    )
    out = jnp.where(ok[:, None], refined, win_pts)
    return jnp.where(fg_count < min_num, jnp.zeros_like(out), out)


def _vote(coords, direct, valid, hyp, inlier_thresh, chunk=128):
    """Inlier counts [hn, vn] for all hypotheses, chunked over hypotheses."""
    hn = hyp.shape[0]

    def body(hyp_c):
        return jnp.sum(_inliers(coords, direct, valid, hyp_c, inlier_thresh, transpose=True), axis=1)

    n_chunks = -(-hn // chunk)
    hyp_p = jnp.pad(hyp, ((0, n_chunks * chunk - hn), (0, 0), (0, 0))).reshape(n_chunks, chunk, *hyp.shape[1:])
    counts = lax.map(body, hyp_p)  # [n_chunks, chunk, vn]
    return counts.reshape(-1, hyp.shape[1])[:hn]


def _inliers(coords, direct, valid, hyp, inlier_thresh, transpose=False):
    """Inlier mask: angle between pixel direction and (hyp - pixel).

    coords [n,2], direct [n,vn,2], hyp [vn,2] or [hc,vn,2].
    Returns [n, vn] (or [hc, n, vn]).
    """
    if hyp.ndim == 2:
        hyp_e = hyp[None, None]  # [1, 1, vn, 2]
    else:
        hyp_e = hyp[:, None]  # [hc, 1, vn, 2]
    dirs_h = hyp_e - coords[None, :, None, :]  # [hc, n, vn, 2]
    d = direct[None]  # [1, n, vn, 2]
    norm_d = jnp.linalg.norm(d, axis=-1)
    norm_h = jnp.linalg.norm(dirs_h, axis=-1)
    ok = (norm_d > 1e-6) & (norm_h > 1e-6)
    ok = ok & (jnp.abs(jnp.sum(hyp_e, axis=-1)) > 1e-6)
    cos = divide_no_nan(jnp.sum(d * dirs_h, axis=-1), norm_d * norm_h)
    out = (ok & (cos > inlier_thresh)).astype(jnp.float32) * valid[None, :, None]
    if hyp.ndim == 2:
        return out[0]
    return out


@partial(jax.jit, static_argnames=("round_hyp_num", "max_iter", "max_num"))
@f32_precision
def ransac_voting_layer_all_masks(
    mask,
    vertex,
    round_hyp_num=512,
    inlier_thresh=0.99,
    confidence=0.99,
    max_iter=1,
    min_num=5,
    max_num=30000,
    rng_key=None,
):
    """Batched RANSAC voting.

    Args:
      mask: [b, h, w, oc] one-hot class masks.
      vertex: [b, h, w, vn, 2] direction fields (dy, dx).
    Returns: [b, oc, vn, 2] voted points, (x, y) pixels.
    """
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    b, h, w, oc = mask.shape
    keys = jax.random.split(rng_key, b * oc).reshape(b, oc, 2)

    def per_image(m_img, v_img, keys_img):
        fn = lambda m, k: _ransac_single(
            m, v_img, k, round_hyp_num, inlier_thresh, max_iter, min_num, max_num, confidence
        )
        return jax.vmap(fn)(m_img.transpose(2, 0, 1), keys_img)

    return jax.vmap(per_image)(mask, vertex, keys)
