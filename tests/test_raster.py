"""RasterMapQuery tests (reference MapQuery data.py:436-506 semantics)."""

import numpy as np
import pytest

from lanegcn_tpu.data.raster import RasterMapQuery, rasterize_lane_graph, _rotate_nearest


def _query_fixture(scale=1):
    # A 40x60 raster with a distinctive pattern.
    rng = np.random.RandomState(0)
    m = (rng.rand(40 * scale, 60 * scale) > 0.5).astype(np.float32)
    return RasterMapQuery(scale, {"MIA": m}, {"MIA": np.array([10.0, 5.0])}), m


def test_query_identity_crop():
    q, m = _query_fixture()
    # region x0..x1, y0..y1 world; offset (10, 5) → pixel x+10, y+5.
    out = q.query([0, 20, 0, 10], theta=0, city="MIA")
    assert out.shape == (10, 20)
    # Cartesian flip: row 0 of output = top = highest y (data.py:501).
    expected = m[5:15, 10:30][::-1]
    np.testing.assert_array_equal(out, expected)


def test_query_scale_and_autoclip():
    q, m = _query_fixture(scale=2)
    out = q.query([-20, 10, -10, 10], theta=0, city="MIA")
    assert out.shape == (40, 60)  # (y1-y0)*2, (x1-x0)*2
    # World x<-10 maps to pixel x<0: autoclip zero-pads that left margin.
    assert (out[:, : 2 * 10] == 0).all()
    assert np.isfinite(out).all()


def test_query_rotation_360_identity():
    q, _ = _query_fixture()
    base = q.query([0, 20, 0, 20], theta=0, city="MIA")
    rot = q.query([0, 20, 0, 20], theta=90, city="MIA")
    assert rot.shape == base.shape
    np.testing.assert_array_equal(q.query([0, 20, 0, 20], theta=360, city="MIA"), base)


def test_rotate_nearest_group_properties():
    img = np.arange(25, dtype=np.float32).reshape(5, 5)
    # Rotating 4x by 90 returns the original (exact for axis rotations).
    r = img
    for _ in range(4):
        r = _rotate_nearest(r, 90)
    np.testing.assert_array_equal(r, img)
    # 90 + 270 = identity.
    np.testing.assert_array_equal(_rotate_nearest(_rotate_nearest(img, 90), 270), img)
    # Same convention as scipy.ndimage.rotate(angle=90) == np.rot90(k=1),
    # which the reference applies after the cartesian flip (data.py:503).
    np.testing.assert_array_equal(_rotate_nearest(img, 90), np.rot90(img, 1))


def test_rasterize_lane_graph_marks_nodes():
    ctrs = np.array([[0.0, 0.0], [4.0, 0.0], [8.0, 0.0]])
    feats = np.array([[4.0, 0.0]] * 3)
    r = rasterize_lane_graph(ctrs, feats, scale=2)
    grid, (ox, oy) = r["map"], r["offset"]
    for x, y in ctrs:
        assert grid[int(round((y + oy) * 2)), int(round((x + ox) * 2))] == 1.0
    # Segment sampling connects the nodes along the lane.
    row = int(round((0.0 + oy) * 2))
    cols = [int(round((x + ox) * 2)) for x in np.linspace(0, 8, 17)]
    assert all(grid[row, c] == 1.0 for c in cols)


def test_from_lane_graph_query_roundtrip():
    ctrs = np.stack([np.linspace(0, 30, 31), np.zeros(31)], 1)
    q = RasterMapQuery.from_lane_graph(ctrs, scale=1)
    out = q.query([0, 30, -5, 5], theta=0)
    assert out.shape == (10, 30)
    assert out.sum() > 0  # the lane shows up in the crop
