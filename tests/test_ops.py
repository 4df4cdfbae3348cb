"""Vector-field GT, connected components, LS voting vs. numpy oracles."""

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from casapose_tpu.ops.connected_components import connected_components_labels, largest_component_mask
from casapose_tpu.ops.vectorfield import compute_vertex_vectorfield
from casapose_tpu.ops.voting import ls_voting


def test_vectorfield_points_at_keypoints():
    h, w, m = 16, 20, 3
    mask = np.zeros((1, h, w, 1), np.int32)
    mask[0, 4:10, 5:12, 0] = 1
    kp = np.array([[3.0, 4.0], [10.0, 15.0], [7.5, 8.5]], np.float32)  # (y, x)
    coords = kp[None, None, None]  # [1, 1, 1, m, 2]
    out = np.asarray(compute_vertex_vectorfield(jnp.asarray(mask), jnp.asarray(coords)))
    assert out.shape == (1, h, w, m * 2)
    # Background is zero.
    assert np.all(out[0, 0, 0] == 0)
    # A foreground pixel's field is the unit vector toward each keypoint.
    y, x = 6, 8
    for k in range(m):
        v = kp[k] - np.array([y + 0.5, x + 0.5])
        v = v / np.linalg.norm(v)
        np.testing.assert_allclose(out[0, y, x, 2 * k : 2 * k + 2], v, atol=1e-5)


def test_vectorfield_multi_instance_nearest_center():
    h, w, m = 12, 12, 2
    mask = np.zeros((1, h, w, 1), np.int32)
    mask[0, :, :, 0] = 1  # all one object class
    # Two instances: centers at (2,2) and (9,9) (keypoint 0 = center).
    coords = np.zeros((1, 1, 2, m, 2), np.float32)
    coords[0, 0, 0] = [[2.0, 2.0], [0.0, 0.0]]
    coords[0, 0, 1] = [[9.0, 9.0], [11.0, 11.0]]
    out = np.asarray(compute_vertex_vectorfield(jnp.asarray(mask), jnp.asarray(coords)))
    # Pixel (1,1) is nearest instance 0; its keypoint-1 direction points to (0,0).
    v = np.array([0.0, 0.0]) - np.array([1.5, 1.5])
    v /= np.linalg.norm(v)
    np.testing.assert_allclose(out[0, 1, 1, 2:4], v, atol=1e-5)
    # Pixel (10,10) is nearest instance 1; keypoint-1 at (11,11).
    v = np.array([11.0, 11.0]) - np.array([10.5, 10.5])
    v /= np.linalg.norm(v)
    np.testing.assert_allclose(out[0, 10, 10, 2:4], v, atol=1e-5)


def _random_blobs(rng, h, w, n_blobs):
    img = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.integers(5, h - 5), rng.integers(5, w - 5)
        ry, rx = rng.integers(2, 6), rng.integers(2, 6)
        yy, xx = np.mgrid[0:h, 0:w]
        img |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
    return img


def test_connected_components_match_scipy():
    rng = np.random.default_rng(0)
    masks = np.stack([_random_blobs(rng, 48, 64, k) for k in [1, 2, 4, 6]])
    labels = np.asarray(connected_components_labels(jnp.asarray(masks)))
    for i in range(masks.shape[0]):
        ref, n_ref = ndimage.label(masks[i], structure=[[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        # Same partition: our labels and scipy's labels must be bijective.
        ours = labels[i]
        assert (ours > 0).sum() == (ref > 0).sum()
        pairs = set(zip(ours.ravel().tolist(), ref.ravel().tolist()))
        fg_pairs = [(a, b) for a, b in pairs if a or b]
        assert len({a for a, _ in fg_pairs}) == n_ref
        assert len({b for _, b in fg_pairs}) == n_ref
        assert len(fg_pairs) == n_ref  # bijection


def test_largest_component_mask():
    img = np.zeros((1, 32, 32), bool)
    img[0, 2:6, 2:6] = True  # 16 px
    img[0, 10:28, 10:28] = True  # 324 px
    img[0, 0, 30:32] = True  # 2 px (below min size)
    out = np.asarray(largest_component_mask(jnp.asarray(img), min_size=50))
    assert out.sum() == 324
    assert out[0, 12, 12] == 1.0
    # Second-largest selection: with min_size filtering the 16px blob dies.
    out2 = np.asarray(largest_component_mask(jnp.asarray(img), min_size=5, second_largest=True))
    assert out2.sum() == 16


def _ls_voting_oracle(seg, dirs, wraw, oc, k):
    """float64 numpy re-implementation following the reference math."""
    b, h, w, _ = seg.shape
    out = np.zeros((b, oc, k, 2))
    wgt = np.logaddexp(wraw, 0.0).astype(np.float64)
    labels = np.argmax(seg, axis=-1)
    n = dirs.reshape(b, h, w, k, 2).astype(np.float64)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.divide(n, norm, out=np.zeros_like(n), where=norm != 0)
    cy, cx = np.mgrid[0:h, 0:w].astype(np.float64) + 0.5
    coords = np.stack([cy / h, cx / h], -1)
    for bi in range(b):
        for o in range(oc):
            m = labels[bi] == o + 1
            for ki in range(k):
                R = np.zeros((2, 2))
                q = np.zeros(2)
                for y, x in zip(*np.nonzero(m)):
                    nn = n[bi, y, x, ki]
                    Rp = (np.eye(2) - np.outer(nn, nn)) * wgt[bi, y, x, ki]
                    R += Rp
                    q += Rp @ coords[y, x]
                out[bi, o, ki] = np.linalg.pinv(R) @ q * h
    return out


def test_ls_voting_recovers_keypoints():
    """Perfect directions + uniform confidence must vote the exact keypoint."""
    rng = np.random.default_rng(1)
    b, h, w, oc, k = 1, 48, 64, 2, 3
    seg = np.zeros((b, h, w, 1 + oc), np.float32)
    seg[..., 0] = 1.0
    seg[0, 5:20, 5:25] = 0
    seg[0, 5:20, 5:25, 1] = 1.0
    seg[0, 28:44, 30:60] = 0
    seg[0, 28:44, 30:60, 2] = 1.0
    kps = np.array(
        [
            [[12.0, 15.0], [2.0, 3.0], [40.0, 55.0]],
            [[35.0, 45.0], [30.0, 31.0], [10.0, 50.0]],
        ],
        np.float32,
    )  # [oc, k] in (y, x)
    cy, cx = np.mgrid[0:h, 0:w].astype(np.float32) + 0.5
    dirs = np.zeros((b, h, w, k * 2), np.float32)
    labels = np.argmax(seg, axis=-1)[0]
    for o in range(oc):
        m = labels == o + 1
        for ki in range(k):
            vy = kps[o, ki, 0] - cy
            vx = kps[o, ki, 1] - cx
            nrm = np.sqrt(vy**2 + vx**2)
            dirs[0, :, :, 2 * ki] = np.where(m, vy / nrm, dirs[0, :, :, 2 * ki])
            dirs[0, :, :, 2 * ki + 1] = np.where(m, vx / nrm, dirs[0, :, :, 2 * ki + 1])
    wraw = rng.normal(size=(b, h, w, k)).astype(np.float32)
    pts = np.asarray(ls_voting(jnp.asarray(seg * 100.0), jnp.asarray(dirs), jnp.asarray(wraw), num_points=k))
    for o in range(oc):
        np.testing.assert_allclose(pts[0, o], kps[o], atol=0.05)


def test_ls_voting_matches_float64_oracle_noisy():
    rng = np.random.default_rng(2)
    b, h, w, oc, k = 2, 24, 32, 2, 4
    seg = rng.normal(size=(b, h, w, 1 + oc)).astype(np.float32)
    dirs = rng.normal(size=(b, h, w, k * 2)).astype(np.float32)
    wraw = rng.normal(size=(b, h, w, k)).astype(np.float32)
    pts = np.asarray(ls_voting(jnp.asarray(seg), jnp.asarray(dirs), jnp.asarray(wraw), num_points=k))
    ref = _ls_voting_oracle(seg, dirs, wraw, oc, k)
    np.testing.assert_allclose(pts, ref, rtol=2e-3, atol=2e-2)


def test_ls_voting_empty_class_is_zero_and_finite():
    b, h, w, oc, k = 1, 16, 16, 3, 2
    seg = np.zeros((b, h, w, 1 + oc), np.float32)
    seg[..., 0] = 10.0  # everything background
    dirs = np.ones((b, h, w, k * 2), np.float32)
    wraw = np.ones((b, h, w, k), np.float32)
    pts = np.asarray(ls_voting(jnp.asarray(seg), jnp.asarray(dirs), jnp.asarray(wraw), num_points=k))
    assert np.all(np.isfinite(pts))
    np.testing.assert_allclose(pts, 0.0, atol=1e-5)


def test_ls_voting_filter_estimates_drops_small_blob():
    b, h, w, oc, k = 1, 64, 64, 1, 2
    seg = np.zeros((b, h, w, 1 + oc), np.float32)
    seg[..., 0] = 1.0
    seg[0, 8:28, 8:28] = 0
    seg[0, 8:28, 8:28, 1] = 1.0  # 400 px main blob
    seg[0, 50:53, 50:53] = 0
    seg[0, 50:53, 50:53, 1] = 1.0  # 9 px noise blob
    kp = np.array([[18.0, 18.0], [10.0, 12.0]], np.float32)
    cy, cx = np.mgrid[0:h, 0:w].astype(np.float32) + 0.5
    dirs = np.zeros((b, h, w, k * 2), np.float32)
    for ki in range(k):
        vy, vx = kp[ki, 0] - cy, kp[ki, 1] - cx
        nrm = np.sqrt(vy**2 + vx**2)
        dirs[0, :, :, 2 * ki] = vy / nrm
        dirs[0, :, :, 2 * ki + 1] = vx / nrm
    # Corrupt the directions inside the noise blob.
    dirs[0, 50:53, 50:53, :] = np.array([0.7, -0.7, 0.7, -0.7], np.float32)
    wraw = np.zeros((b, h, w, k), np.float32)
    pts = np.asarray(
        ls_voting(jnp.asarray(seg * 100), jnp.asarray(dirs), jnp.asarray(wraw), num_points=k, filter_estimates=True)
    )
    for ki in range(k):
        np.testing.assert_allclose(pts[0, 0, ki], kp[ki], atol=0.1)
