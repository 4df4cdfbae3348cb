"""Z-buffer rasterizer (dataset converter "render" mask mode).

Validates casapose_tpu/data/raster.py against analytic geometry: coverage,
perspective-correct depth, occlusion ordering, clip planes, and the
face-aware mesh loaders it depends on.  Reference semantics:
util_scripts/dataset_converter.py:64-96 (per-object depth render + argmin).
"""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from casapose_tpu.data.mesh import load_mesh  # noqa: E402
from casapose_tpu.data.raster import render_depth, render_id_mask  # noqa: E402

K = np.array([[320.0, 0, 160.0], [0, 320.0, 120.0], [0, 0, 1.0]])
W, H = 320, 240
I3, T0 = np.eye(3), np.zeros(3)


def _square(side, z, cx=0.0, cy=0.0):
    """Two triangles forming an axis-aligned square at depth z (model frame)."""
    s = side / 2.0
    verts = np.array(
        [[cx - s, cy - s, z], [cx + s, cy - s, z], [cx + s, cy + s, z], [cx - s, cy + s, z]], np.float64
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


def test_flat_square_coverage_and_depth():
    verts, faces = _square(100.0, 800.0)
    depth = render_depth(verts, faces, K, I3, T0, W, H)
    # u in [140, 180], v in [100, 140]; centers j+0.5 inside -> j in [140, 179]
    hit = np.isfinite(depth)
    rows, cols = np.nonzero(hit)
    assert cols.min() == 140 and cols.max() == 179
    assert rows.min() == 100 and rows.max() == 139
    np.testing.assert_allclose(depth[hit], 800.0, rtol=1e-12)
    assert not np.isfinite(depth[~hit]).any()


def test_single_pixel_bbox_triangle_rasterizes():
    # Regression: extent == 1 triangles fell into no size bucket and were
    # silently dropped (dense distant meshes project to 1-px bboxes).
    z = 800.0
    # covers exactly pixel center (160.5, 120.5) -> u in [160.3, 160.7]
    verts = (
        np.array([[160.3, 120.3, 1.0], [160.7, 120.35, 1.0], [160.5, 120.7, 1.0]]) - [160.0, 120.0, 0]
    ) * np.array([z / 320.0, z / 320.0, z])
    faces = np.array([[0, 1, 2]])
    depth = render_depth(verts, faces, K, I3, T0, W, H)
    assert np.isfinite(depth).sum() == 1
    np.testing.assert_allclose(depth[120, 160], z, rtol=1e-9)


def test_perspective_correct_depth_on_slanted_triangle():
    verts = np.array([[-60.0, -60.0, 600.0], [90.0, -30.0, 900.0], [-30.0, 80.0, 700.0]])
    faces = np.array([[0, 1, 2]])
    depth = render_depth(verts, faces, K, I3, T0, W, H, near=10.0, far=5000.0)
    n = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    d0 = n @ verts[0]
    hit = np.nonzero(np.isfinite(depth))
    assert hit[0].size > 50
    for i, j in zip(hit[0][::97], hit[1][::97]):
        ray = np.array([(j + 0.5 - K[0, 2]) / K[0, 0], (i + 0.5 - K[1, 2]) / K[1, 1], 1.0])
        z_true = d0 / (n @ ray)  # ray-plane intersection, camera frame
        np.testing.assert_allclose(depth[i, j], z_true, rtol=1e-9)


def test_winding_order_is_irrelevant():
    verts, faces = _square(100.0, 800.0)
    flipped = faces[:, ::-1]
    a = render_depth(verts, faces, K, I3, T0, W, H)
    b = render_depth(verts, flipped, K, I3, T0, W, H)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    np.testing.assert_allclose(a[np.isfinite(a)], b[np.isfinite(b)], rtol=1e-12)


def test_clip_planes():
    verts, faces = _square(100.0, 50.0)  # closer than near=100 -> discarded
    assert not np.isfinite(render_depth(verts, faces, K, I3, T0, W, H)).any()
    verts, faces = _square(100.0, 3000.0)  # beyond far=2000 -> dropped
    assert not np.isfinite(render_depth(verts, faces, K, I3, T0, W, H)).any()
    assert np.isfinite(render_depth(verts, faces, K, I3, T0, W, H, far=5000.0)).any()


def test_pose_transform_applied():
    # Model-frame square centered at origin, translated by t.
    verts, faces = _square(100.0, 0.0)
    R = I3
    t = np.array([20.0, -10.0, 900.0])
    depth = render_depth(verts, faces, K, R, t, W, H)
    hit = np.isfinite(depth)
    np.testing.assert_allclose(depth[hit], 900.0, rtol=1e-12)
    rows, cols = np.nonzero(hit)
    # center shifts to u = 160 + 320*20/900, v = 120 - 320*10/900
    assert abs((cols.mean() + 0.5) - (160 + 320 * 20 / 900)) < 1.0
    assert abs((rows.mean() + 0.5) - (120 - 320 * 10 / 900)) < 1.0


def test_occlusion_nearest_wins_and_ids():
    near_sq = _square(80.0, 0.0)
    far_sq = _square(160.0, 0.0)
    mask = render_id_mask(
        [far_sq, near_sq],
        [(I3, np.array([0.0, 0.0, 1000.0])), (I3, np.array([0.0, 0.0, 600.0]))],
        ids=[7, 3], K=K, width=W, height=H,
    )
    # the small square is nearer AND has the larger screen footprint here
    # (80mm @600 -> ±21.3px; 160mm @1000 -> ±25.6px): id 3 fills the center,
    # id 7 only the ring where the near square does not cover the far one.
    assert mask[120, 160] == 3
    assert mask[120, 160 + 23] == 7  # inside far square, outside near one
    assert mask[0, 0] == 0
    assert set(np.unique(mask)) == {0, 3, 7}


def test_shared_zbuf_accumulates():
    verts, faces = _square(100.0, 800.0)
    zbuf = render_depth(verts, faces, K, I3, T0, W, H)
    verts2, faces2 = _square(100.0, 700.0, cx=30.0)
    zbuf = render_depth(verts2, faces2, K, I3, T0, W, H, zbuf=zbuf)
    fin = zbuf[np.isfinite(zbuf)]
    assert np.isclose(fin, 700.0).any() and np.isclose(fin, 800.0).any()
    # overlap resolves to the nearer surface
    np.testing.assert_allclose(zbuf[120, 172], 700.0, rtol=1e-9)


def test_large_triangle_fallback_path():
    # bbox wider than the largest vectorized group (512): per-triangle path
    verts = np.array([[-400.0, -300.0, 500.0], [400.0, -300.0, 500.0], [0.0, 350.0, 500.0]])
    faces = np.array([[0, 1, 2]])
    depth = render_depth(verts, faces, K, I3, T0, W, H, far=5000.0)
    assert np.isfinite(depth).mean() > 0.5
    np.testing.assert_allclose(depth[np.isfinite(depth)], 500.0, rtol=1e-12)


# ---- face-aware mesh loaders -------------------------------------------------


def test_load_ply_mesh_ascii_with_quad(tmp_path):
    p = tmp_path / "m.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "3 0 1 2\n4 0 1 2 3\n"  # one triangle + one quad (fan -> 2 tris)
    )
    verts, faces = load_mesh(str(p))
    assert verts.shape == (4, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 1, 2], [0, 2, 3]])


def test_load_ply_mesh_binary(tmp_path):
    p = tmp_path / "m.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\nproperty float x\nproperty float y\nproperty float z\n"
        b"element face 1\nproperty list uchar int vertex_indices\nend_header\n"
    )
    body = b"".join(struct.pack("<3f", *v) for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)])
    body += struct.pack("<B3i", 3, 0, 1, 2)
    p.write_bytes(header + body)
    verts, faces = load_mesh(str(p))
    np.testing.assert_allclose(verts, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(faces, [[0, 1, 2]])


def test_load_ply_mesh_binary_mixed_polygons(tmp_path):
    p = tmp_path / "m.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 4\nproperty float x\nproperty float y\nproperty float z\n"
        b"element face 2\nproperty list uchar int vertex_indices\nend_header\n"
    )
    body = b"".join(struct.pack("<3f", *v) for v in [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)])
    body += struct.pack("<B3i", 3, 0, 1, 2) + struct.pack("<B4i", 4, 0, 1, 2, 3)
    p.write_bytes(header + body)
    verts, faces = load_mesh(str(p))
    assert verts.shape == (4, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 1, 2], [0, 2, 3]])


def test_load_obj_mesh(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3 4/4/4\n")
    verts, faces = load_mesh(str(p))
    assert verts.shape == (4, 3)
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])
