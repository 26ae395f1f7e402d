"""Tests for auxiliary/legacy-surface components: ROI sampling, 2-D blocks,
EncodeDist, rotation augmentation, dilated_nbrs2, submission writer, utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from lanegcn_tpu.ops.roi import get_pixel_feat, get_roi_feat, linear_interp


def test_linear_interp_torch_reference_semantics():
    x = jnp.array([0.0, 0.3, 0.5, 0.99])
    lw, li, rw, ri = linear_interp(x, 10)
    # position 0.3 → pixel coord 2.5 → between pixels 2 and 3, weights .5/.5
    assert int(li[1]) == 2 and int(ri[1]) == 3
    np.testing.assert_allclose(float(lw[1]), 0.5, atol=1e-6)
    # clamped at borders
    assert int(li[0]) == 0
    assert int(ri[3]) == 9


def test_get_pixel_feat_center_sample():
    fm = jnp.arange(25.0).reshape(5, 5, 1)
    # Center of the (2,2) pixel in a [0,5]² world with y flipped.
    pts = jnp.array([[2.5, 2.5]])
    out = get_pixel_feat(fm, pts, (0.0, 5.0, 0.0, 5.0))
    np.testing.assert_allclose(np.asarray(out)[0, 0], 12.0, atol=1e-5)


def test_get_roi_feat_shapes_and_masking():
    fm = jnp.ones((8, 8, 3))
    boxes = jnp.array(
        [[4.0, 4.0, 2.0, 2.0, 0.3], [100.0, 100.0, 2.0, 2.0, 0.0]]  # 2nd off-map
    )
    out = get_roi_feat(fm, boxes, 4, (0.0, 8.0, 0.0, 8.0))
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out)[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[1], 0.0, atol=1e-6)


def test_conv2d_and_postres_blocks():
    from lanegcn_tpu.models.layers import Conv2dBlock, Null, PostRes

    x = jnp.ones((2, 8, 8, 4))
    m = Conv2dBlock(8)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (2, 8, 8, 8)

    m2 = PostRes(8, stride=2)
    p2 = m2.init(jax.random.PRNGKey(1), x)["params"]
    y2 = m2.apply({"params": p2}, x)
    assert y2.shape == (2, 4, 4, 8)

    assert (Null().apply({"params": {}}, x) == x).all()


def test_encode_dist_matches_formula():
    from lanegcn_tpu.models.layers import EncodeDist

    x = jnp.array([[3.0, -2.0], [-0.5, 0.0]])
    m = EncodeDist(16)
    p = m.init(jax.random.PRNGKey(2), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == (2, 16)
    # sign·log(1+|x|) encoding feeds the MLP; check via the first layer input.
    enc = np.stack(
        [np.sign(x[:, 0]) * np.log(np.abs(x[:, 0]) + 1), np.sign(x[:, 1]) * np.log(np.abs(x[:, 1]) + 1)],
        axis=1,
    )
    ref = np.maximum(enc @ np.asarray(p["dense"]["kernel"]) + np.asarray(p["dense"]["bias"]), 0)
    ref = ref @ np.asarray(p["out"]["kernel"]) + np.asarray(p["out"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_rotation_augment_preserves_world_frame():
    """World-frame reconstruction agent = a @ rot + orig must be invariant."""
    from lanegcn_tpu.data import make_synthetic_scenario
    from lanegcn_tpu.data.augment import rotate_scenario

    s = make_synthetic_scenario(seed=3, num_corridors=1, num_actors=4)
    s2 = rotate_scenario(s, dt=0.7)
    # ctrs in world frame: ctr @ rot + orig.
    w1 = s["ctrs"] @ s["rot"] + s["orig"]
    w2 = s2["ctrs"] @ s2["rot"] + s2["orig"]
    np.testing.assert_allclose(w1, w2, atol=1e-3)
    g1 = s["graph"]["ctrs"] @ s["rot"] + s["orig"]
    g2 = s2["graph"]["ctrs"] @ s2["rot"] + s2["orig"]
    np.testing.assert_allclose(g1, g2, atol=1e-3)
    np.testing.assert_allclose(s["gt_preds"], s2["gt_preds"])  # world gt untouched


def test_dilated_nbrs2_explicit_scales():
    from lanegcn_tpu.data.lane_graph import dilated_nbrs2

    # Chain 0→1→…→9; scale list [2, 3] → exact 2-hop and 3-hop pairs.
    u = np.arange(9)
    v = np.arange(1, 10)
    out = dilated_nbrs2(u, v, 10, [2, 3])
    assert set(zip(out[0][0].tolist(), out[0][1].tolist())) == {
        (i, i + 2) for i in range(8)
    }
    assert set(zip(out[1][0].tolist(), out[1][1].tolist())) == {
        (i, i + 3) for i in range(7)
    }


def test_write_submission_roundtrip(tmp_path):
    from lanegcn_tpu.eval import write_submission

    preds = np.random.default_rng(0).normal(size=(3, 6, 30, 2)).astype(np.float32)
    ids = np.array([10, 20, 30])
    path = str(tmp_path / "sub")
    write_submission(path, preds, ids)
    import h5py

    with h5py.File(path + ".h5", "r") as f:
        rows = f["argoverse_forecasting"][:]
    assert rows.shape == (3 * 6 * 30, 5)
    assert rows[0, 0] == 10 and rows[-1, 0] == 30
    np.testing.assert_allclose(rows[:180, 2:4], preds[0].reshape(-1, 2), atol=1e-6)


def test_misc_utils():
    from lanegcn_tpu.utils.misc import index_dict, merge_dict, rotate

    d = {"a": np.arange(5), "b": np.arange(5) * 2}
    sel = index_dict(d, np.array([1, 3]))
    assert sel["a"].tolist() == [1, 3] and sel["b"].tolist() == [2, 6]

    xy = np.array([[1.0, 0.0]])
    out = rotate(xy, np.array([np.pi / 2]))
    np.testing.assert_allclose(out, [[0.0, 1.0]], atol=1e-6)

    dst = {}
    merge_dict({"x": 1}, dst)
    assert dst == {"x": 1}


def test_sync_metric_sums_single_host():
    from lanegcn_tpu.parallel.multihost import process_seed, sync_metric_sums

    m = sync_metric_sums({"a": 1.5, "b": 2.0})
    assert m == {"a": 1.5, "b": 2.0}
    assert process_seed(7) == 7
