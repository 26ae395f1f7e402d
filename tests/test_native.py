"""Native C++ data kernels vs the numpy/scipy reference implementations."""

import numpy as np
import pytest
from scipy import sparse

from lanegcn_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels unavailable (no compiler)"
)


def test_dilated_nbrs_matches_scipy():
    rng = np.random.default_rng(0)
    n, e = 200, 400
    u = rng.integers(0, n, e).astype(np.int32)
    v = rng.integers(0, n, e).astype(np.int32)

    ours = native.dilated_nbrs(u, v, n, 4)
    mat = sparse.csr_matrix((np.ones(e, bool), (u, v)), shape=(n, n))
    for s in range(3):
        mat = mat * mat
        coo = mat.tocoo()
        expect = set(zip(coo.row.tolist(), coo.col.tolist()))
        got = set(zip(ours[s][0].tolist(), ours[s][1].tolist()))
        assert got == expect, f"scale {s}: {len(got)} vs {len(expect)}"


def test_threshold_edges_matches_numpy():
    rng = np.random.default_rng(1)
    dst = rng.uniform(-50, 50, (300, 2)).astype(np.float32)
    src = rng.uniform(-50, 50, (200, 2)).astype(np.float32)
    th = 7.0
    ou, ov = native.threshold_edges(dst, src, th)
    d = np.sqrt(((dst[:, None] - src[None]) ** 2).sum(2))
    eu, ev = np.nonzero(d <= th)
    assert set(zip(ou.tolist(), ov.tolist())) == set(zip(eu.tolist(), ev.tolist()))


def test_cross_edges_matches_numpy():
    rng = np.random.default_rng(2)
    num_lanes, nodes_per = 6, 30
    n = num_lanes * nodes_per
    ctrs = rng.uniform(-30, 30, (n, 2)).astype(np.float32)
    feats = rng.normal(0, 1, (n, 2)).astype(np.float32)
    lane_idcs = np.repeat(np.arange(num_lanes), nodes_per).astype(np.int64)
    reach = rng.random((num_lanes, num_lanes)) < 0.3
    cross_dist = 6.0

    ou, ov = native.cross_edges(ctrs, feats, lane_idcs, reach, cross_dist)

    # numpy reference (mirrors lane_graph._cross_edges fallback).
    d = np.sqrt(((ctrs[:, None] - ctrs[None]) ** 2).sum(2))
    allowed = reach[lane_idcs[:, None], lane_idcs[None, :]]
    sd = np.where(allowed, d, 1e6)
    min_idcs = sd.argmin(1)
    min_dist = sd[np.arange(n), min_idcs]
    mask = min_dist < cross_dist
    ui = np.arange(n)[mask]
    vi = min_idcs[mask]
    t1 = np.arctan2(feats[ui, 1], feats[ui, 0])
    t2 = np.arctan2(feats[vi, 1], feats[vi, 0])
    dt = np.abs(t1 - t2)
    dt = np.where(dt > np.pi, np.abs(dt - 2 * np.pi), dt)
    keep = dt < 0.25 * np.pi
    expect = set(zip(ui[keep].tolist(), vi[keep].tolist()))
    assert set(zip(ou.tolist(), ov.tolist())) == expect


def test_native_speedup_in_pipeline():
    """Graph build must produce identical edges with native on/off."""
    import os

    from lanegcn_tpu.data import make_synthetic_scenario

    s1 = make_synthetic_scenario(seed=7, num_corridors=2, num_actors=6)
    os.environ["LANEGCN_TPU_NATIVE"] = "0"
    try:
        # Force a fresh decision in the loader.
        native._lib = None
        s2 = make_synthetic_scenario(seed=7, num_corridors=2, num_actors=6)
    finally:
        os.environ.pop("LANEGCN_TPU_NATIVE")
        native._lib = None

    for kind in ("pre", "suc"):
        for sc in range(6):
            a = set(zip(s1["graph"][kind][sc]["u"].tolist(), s1["graph"][kind][sc]["v"].tolist()))
            b = set(zip(s2["graph"][kind][sc]["u"].tolist(), s2["graph"][kind][sc]["v"].tolist()))
            assert a == b, f"{kind}{sc}"
    for kind in ("left", "right"):
        a = set(zip(s1["graph"][kind]["u"].tolist(), s1["graph"][kind]["v"].tolist()))
        b = set(zip(s2["graph"][kind]["u"].tolist(), s2["graph"][kind]["v"].tolist()))
        assert a == b, kind
