"""Connected-component labeling as fixed-shape, on-device label propagation.

Replaces ``tfa.image.connected_components`` (a C++/CUDA custom op used by
the LS-voting instance filter, casapose/pose_estimation/voting_layers_2d.py:
43-79) with a TPU-friendly formulation:

  * every foreground pixel starts with a unique label (its linear index + 1);
  * labels are propagated with *segmented max-scans* along rows and columns
    (``jax.lax.associative_scan`` with a reset-at-background operator), which
    floods an entire contiguous run per sweep instead of one pixel per step;
  * sweeps repeat under ``lax.while_loop`` until a fixed point — typically
    a handful of iterations for real object masks, vs O(image diameter) for
    naive 4-neighbor dilation.

The result is 4-connected components identified by their maximum linear
index, from which per-component sizes follow with one scatter-add.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _segmented_max_scan(values, resets, axis, reverse=False):
    """Max-scan of ``values`` along ``axis`` that restarts at ``resets``.

    Classic segmented-scan operator (associative):
      (r1, v1) . (r2, v2) = (r1|r2, v2 if r2 else max(v1, v2))
    """

    def combine(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, jnp.maximum(va, vb))

    _, out = lax.associative_scan(combine, (resets, values), axis=axis, reverse=reverse)
    return out


def _sweep(labels, fg):
    """One row+column flood sweep (both directions)."""
    resets = ~fg
    for axis in (2, 1):  # rows then columns
        fwd = _segmented_max_scan(labels, resets, axis=axis)
        bwd = _segmented_max_scan(labels, resets, axis=axis, reverse=True)
        labels = jnp.where(fg, jnp.maximum(fwd, bwd), 0)
    return labels


def connected_components_labels(fg, max_sweeps=64):
    """4-connected component labels of binary masks.

    Args:
      fg: [M, h, w] boolean foreground masks.
      max_sweeps: safety cap on flood sweeps (each sweep floods whole
        row/column runs, so convergence is fast in practice).
    Returns:
      [M, h, w] int32 labels: 0 on background; each component carries its
      maximum linear index + 1.
    """
    m, h, w = fg.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(1, h, w)
    labels = jnp.where(fg, idx, 0)

    def cond(state):
        i, labels, changed = state
        return changed & (i < max_sweeps)

    def body(state):
        i, labels, _ = state
        new = _sweep(labels, fg)
        return i + 1, new, jnp.any(new != labels)

    _, labels, _ = lax.while_loop(cond, body, (jnp.int32(0), labels, jnp.bool_(True)))
    return labels


def _run_lengths_sorted(s):
    """Run start/length for each position of a sorted row ``s`` [P].

    Sort + two segmented scans replace the histogram scatter (TPU scatters
    with colliding indices serialize; sorts and scans are vectorized).
    """
    p = s.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    new_run = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])

    def combine(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, va)

    _, start = lax.associative_scan(combine, (new_run, idx))
    run_end_flag = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
    _, end = lax.associative_scan(combine, (run_end_flag, idx), reverse=True)
    return start, end - start + 1


def _run_totals_sorted(s, w):
    """Per-position sum of ``w`` over the run of equal values in sorted ``s``.

    Segmented cumulative sum within each run, then the run-end total is
    propagated back over the whole run (two associative scans).
    """
    new_run = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    run_end = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])

    def seg_sum(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, va + vb)

    _, csum = lax.associative_scan(seg_sum, (new_run, w))

    def hold(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, va)

    _, total = lax.associative_scan(hold, (run_end, csum), reverse=True)
    return total


def largest_component_mask(fg, min_size=50, second_largest=False, weights=None, weight_bits=5):
    """Keep only the largest (or second-largest) component of each mask.

    Mirrors the reference's bincount + top-k filter
    (voting_layers_2d.py:58-79): components smaller than ``min_size`` are
    discarded entirely. Component sizes come from sorted-run computations
    rather than a scatter histogram (TPU scatters with colliding indices
    serialize; sorts and scans are vectorized).

    Args:
      fg: [M, h, w] boolean masks.
      weights: optional [M, h, w] per-pixel size weights. When the masks are
        a coarsened view (instance_filter_mask downsample > 1), passing the
        fine-pixel count per coarse cell makes both the ``min_size``
        threshold and the largest-component choice exact in TRUE pixels —
        only connectivity stays approximated. Each weight must fit in
        ``weight_bits`` bits: label and weight are packed into one int32
        sort key, so ONE sort orders both (an argsort + gathers measurably
        slows the whole inference pipeline).
    Returns:
      [M, h, w] float32 mask of the selected component (possibly all-zero).
    """
    m, h, w = fg.shape
    labels = connected_components_labels(fg)
    flat = labels.reshape(m, h * w)

    if weights is None:
        pack_bits = 0
        packed = flat
    else:
        pack_bits = weight_bits
        wflat = jnp.minimum(weights.reshape(m, h * w).astype(jnp.int32), (1 << weight_bits) - 1)
        packed = (flat << pack_bits) | wflat

    def best_label_for(row):
        s_packed = jnp.sort(row)
        s = s_packed >> pack_bits if pack_bits else s_packed
        if pack_bits:
            run_size = _run_totals_sorted(s, s_packed & ((1 << pack_bits) - 1))
        else:
            _, run_size = _run_lengths_sorted(s)
        valid = (s > 0) & (run_size >= min_size)
        score = jnp.where(valid, run_size, 0)
        best = s[jnp.argmax(score)]
        best_ok = jnp.max(score) > 0
        if second_largest:
            score2 = jnp.where(valid & (s != best), run_size, 0)
            best2 = s[jnp.argmax(score2)]
            best2_ok = jnp.max(score2) > 0
            return jnp.where(best2_ok, best2, -1)
        return jnp.where(best_ok, best, -1)

    target = jax.vmap(best_label_for)(flat if weights is None else packed)  # [M]
    keep = fg & (labels == target[:, None, None]) & (target[:, None, None] > 0)
    return keep.astype(jnp.float32)
