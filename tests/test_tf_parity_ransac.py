"""Cross-framework RANSAC voting parity (VERDICT r2 item 2a).

The reference ``ransac_voting_layer_all_masks`` (ransac_voting.py:446-484)
and our fixed-shape rebuild (pose/ransac.py) use different PRNG streams,
so the hypothesis sequences can never match; what MUST match is what both
converge to — the final inlier-weighted least-squares refinement over the
(near-complete) inlier set. On clean fields that solution is independent
of the sampled hypotheses; on noisy fields the inlier sets may differ
slightly, widening the band.
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


def _fixture(noise):
    argv = ["ransac"] + (["--noise", str(noise)] if noise else [])
    try:
        out = ensure_fixtures([argv])[0]
    except RuntimeError as e:
        oracle_skip(e)
    return np.load(os.path.join(out, "ransac_fixture.npz"))


@pytest.mark.parametrize("noise,band_ref,band_gt", [(0.0, 0.01, 0.01), (0.05, 0.5, 0.5)])
def test_ransac_converged_keypoint_parity(noise, band_ref, band_gt):
    import jax

    from casapose_tpu.pose.ransac import ransac_voting_layer_all_masks

    fx = _fixture(noise)
    ours = np.asarray(
        ransac_voting_layer_all_masks(
            fx["mask"],
            fx["vertex"],
            round_hyp_num=int(fx["hyps"]),
            inlier_thresh=float(fx["inlier_thresh"]),
            max_iter=int(fx["max_iter"]),
            rng_key=jax.random.PRNGKey(7),
        )
    )
    ref = fx["output"]
    assert ours.shape == ref.shape
    d_ref = np.abs(ours - ref).max()
    d_gt = np.abs(ours - fx["gt_kp"]).max()
    assert d_ref < band_ref, f"converged keypoints diverge from reference: {d_ref} px"
    assert d_gt < band_gt, f"converged keypoints diverge from ground truth: {d_gt} px"
