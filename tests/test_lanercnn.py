"""LaneRCNN tests: RoI generation, packing, NMS, forward/loss/grad."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, LossConfig, ModelConfig, RoiPackConfig
from lanegcn_tpu.data import make_synthetic_scenario
from lanegcn_tpu.data.lane_roi import agent_velocities, generate_lane_rois
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.lanercnn import (
    LaneRCNN,
    roi_loss,
    roi_metrics,
    segmented_nms,
)

TINY_ROI = RoiPackConfig(
    max_scenarios=2,
    max_rois=24,
    max_roi_nodes=4096,
    max_interest_nodes=512,
    max_edges_scale0=6144,
    max_edges_dilated=8192,
    max_edges_lr=6144,
    max_a2m_edges=1024,
    max_pool_edges=12288,
    max_a2r_edges=2048,
)


@pytest.fixture(scope="module")
def scens():
    out = []
    for i in range(2):
        s = make_synthetic_scenario(seed=40 + i, num_corridors=2, num_actors=6)
        out.append(generate_lane_rois(s))
    return out


@pytest.fixture(scope="module")
def batch(scens):
    cfg = Config(roi_pack=TINY_ROI)
    b, stats = pack_roi_batch(scens, cfg.roi_pack, cfg.model)
    assert stats["packed_scenarios"] == 2, stats
    return jax.tree.map(jnp.asarray, b)


def test_agent_velocities():
    feats = np.zeros((2, 20, 3), np.float32)
    feats[0, 1:, 0] = 1.0  # 1 m per 0.1 s step from t=1 → 19 m over 2.0 s? —
    # duration counts first..last moving step inclusive: (19-1+1)*0.1 = 1.9 s.
    vel = agent_velocities(feats)
    assert vel[0] == pytest.approx(19.0 / 1.9, rel=1e-5)
    assert vel[1] == 0.0


def test_roi_generation(scens):
    for s in scens:
        assert len(s["subgraphs"]) > 0
        assert len(s["subgraphs"]) == len(s["valid_agent_ids"])
        for sub in s["subgraphs"]:
            assert sub["num_nodes"] >= 6
            assert sub["feats"].shape == (sub["num_nodes"], 8)
            assert sub["agent_feat"].shape == (80,)
            # Edges index within the subgraph.
            for st in range(6):
                for kind in ("pre", "suc"):
                    e = sub[kind][st]
                    if len(e["u"]):
                        assert e["u"].max() < sub["num_nodes"]
                        assert e["v"].max() < sub["num_nodes"]
            assert len(sub["pre"][0]["u"]) + len(sub["suc"][0]["u"]) > 0


def test_pack_roi_batch_layout(scens):
    cfg = Config(roi_pack=TINY_ROI)
    b, stats = pack_roi_batch(scens, cfg.roi_pack, cfg.model)
    m = np.asarray(b.node_mask)
    assert stats["num_roi_nodes"] == m.sum()
    # node_roi of valid nodes points at valid RoIs.
    roi_ids = np.asarray(b.node_roi)[m]
    assert np.asarray(b.roi_mask)[roi_ids].all()
    # Interest nodes map into valid node rows of the right scenario.
    im = np.asarray(b.int_node_mask)
    rows = np.asarray(b.int_node_idx)[im]
    assert m[rows].all()
    scen_of_roi = np.asarray(b.roi_scen)[np.asarray(b.node_roi)[rows]]
    assert (scen_of_roi == np.asarray(b.int_node_scen)[im]).all()
    # Pooling edges stay within valid nodes.
    pm = np.asarray(b.r2g.mask)
    if pm.any():
        assert np.asarray(b.graph.node_mask)[np.asarray(b.r2g.u)[pm]].all()
        assert m[np.asarray(b.r2g.v)[pm]].all()


def test_segmented_nms_greedy_semantics():
    # One segment: points on a line, logits descending with index.
    xy = jnp.array([[0.0, 0], [1.0, 0], [3.0, 0], [3.5, 0], [10.0, 0]])
    logits = jnp.array([5.0, 4.0, 3.0, 2.0, 1.0])
    seg = jnp.zeros(5, jnp.int32)
    mask = jnp.ones(5, bool)
    sel = segmented_nms(xy, logits, seg, mask, num_seg=1, k=5, threshold=2.0)
    sel = np.asarray(sel)[0]
    # Greedy: 0 (suppresses 1), 2 (suppresses 3), 4; then fallback fills 1, 3.
    assert sel.tolist() == [0, 2, 4, 1, 3]


def test_segmented_nms_segments_isolated():
    xy = jnp.array([[0.0, 0], [0.5, 0], [0.0, 0], [0.5, 0]])
    logits = jnp.array([1.0, 2.0, 3.0, 4.0])
    seg = jnp.array([0, 0, 1, 1], jnp.int32)
    mask = jnp.ones(4, bool)
    sel = np.asarray(segmented_nms(xy, logits, seg, mask, num_seg=2, k=2))
    assert sel[0].tolist() == [1, 0]  # seg-0 picks its own best, then fallback
    assert sel[1].tolist() == [3, 2]


@pytest.fixture(scope="module")
def forward(batch):
    cfg = Config(roi_pack=TINY_ROI)
    net = LaneRCNN(cfg.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    out = jax.jit(lambda p, b: net.apply({"params": p}, b))(params, batch)
    return net, params, out


def test_lanercnn_forward_shapes(batch, forward):
    _, _, out = forward
    b = batch.agt_ctrs.shape[0]
    assert out["pred_logics"].shape == (b, 6)
    assert out["pred_goals"].shape == (b, 6, 2)
    assert out["pred_trajs"].shape == (b, 6, 30, 2)
    sm = np.asarray(batch.scen_mask)
    assert np.isfinite(np.asarray(out["pred_trajs"])[sm]).all()
    assert np.isfinite(np.asarray(out["pred_logics"])[sm]).all()


def test_lanercnn_loss_and_metrics(batch, forward):
    _, _, out = forward
    losses = roi_loss(out, batch, LossConfig())
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["num_cls"]) == 2
    assert float(losses["num_reg_traj"]) > 0
    m = roi_metrics(out, batch)
    assert float(m["num_scen"]) == 2
    assert np.isfinite(float(m["ade_sum"]))


@pytest.mark.slow
def test_lanercnn_gradients(batch, forward):
    net, params, _ = forward

    def loss_fn(p):
        out = net.apply({"params": p}, batch)
        return roi_loss(out, batch, LossConfig())["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = [float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(l) for l in leaves)
    nonzero = sum(1 for l in leaves if l > 0)
    assert nonzero / len(leaves) > 0.85, f"{nonzero}/{len(leaves)} grads nonzero"


def test_lanercnn_bands_equal_edge_lists(scens, forward):
    """split_bands=True (masked-roll path in the RoI LaneConv) must equal
    split_bands=False (explicit edge lists) on the same scenarios."""
    net, params, _ = forward
    cfg = Config(roi_pack=TINY_ROI)
    b_band, s_band = pack_roi_batch(scens, cfg.roi_pack, cfg.model, split_bands=True)
    b_list, s_list = pack_roi_batch(scens, cfg.roi_pack, cfg.model, split_bands=False)
    assert sum(v for k, v in s_band.items() if k.startswith("banded")) > 0
    out_band = net.apply({"params": params}, jax.tree.map(jnp.asarray, b_band))
    out_list = net.apply({"params": params}, jax.tree.map(jnp.asarray, b_list))
    for k in out_band:
        np.testing.assert_allclose(out_band[k], out_list[k], rtol=2e-5, atol=2e-5)


def test_roi_pack_cache_identical_and_picklable(scens):
    """Cold pack (builds RoI caches) and warm pack (memoized / from shards)
    must produce identical RoI batches through a pickle round-trip."""
    import pickle

    cfg = Config(roi_pack=TINY_ROI)
    cold, s_cold = pack_roi_batch(scens, cfg.roi_pack, cfg.model)
    assert all("_roi_pack" in s for s in scens)
    warm, s_warm = pack_roi_batch(pickle.loads(pickle.dumps(scens)), cfg.roi_pack, cfg.model)
    assert s_cold == s_warm
    for a, b in zip(jax.tree.leaves(cold), jax.tree.leaves(warm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roi_loss_for_goals(batch, forward):
    """Goal-only loss variant (reference RoiLossForGoals): equals roi_loss
    minus the trajectory term, finite and differentiable."""
    from lanegcn_tpu.models.lanercnn import roi_loss_for_goals

    net, params, out = forward
    cfg = LossConfig()
    full = roi_loss(out, batch, cfg)
    goals_only = roi_loss_for_goals(out, batch, cfg)
    assert np.isfinite(float(goals_only["loss"]))
    # Same cls + goal terms as the active RoiLoss, no trajectory term.
    np.testing.assert_allclose(
        float(goals_only["cls_loss"]), float(full["cls_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(goals_only["reg_loss"]), float(full["reg_goal_loss"]), rtol=1e-6
    )
    assert goals_only["goals_to_eval"].shape == (batch.agt_ctrs.shape[0], 2)

    def loss_fn(p):
        o = net.apply({"params": p}, batch)
        return roi_loss_for_goals(o, batch, cfg)["loss"]

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(float(jnp.sum(g))) for g in jax.tree.leaves(grads))


def test_standalone_heads(batch):
    """PredHead/RefineHead (commented out of the reference Net) exist as
    standalone modules with the reference output shapes."""
    from lanegcn_tpu.models.lanercnn import PredHead, RefineHead

    cfg = Config(roi_pack=TINY_ROI)
    feat = jnp.ones((17, cfg.model.n_actor), jnp.float32)
    ph = PredHead(cfg.model)
    out = ph.apply({"params": ph.init(jax.random.PRNGKey(0), feat)["params"]}, feat)
    assert out.shape == (17, 5)
    rh = RefineHead(cfg.model)
    out = rh.apply({"params": rh.init(jax.random.PRNGKey(1), feat)["params"]}, feat)
    assert out.shape == (17, 6, 30, 2)


@pytest.mark.slow
def test_remat_pooling_parity(batch, forward):
    """remat=True (pooling stages rematerialized in backward) must produce
    identical outputs and near-identical gradients to remat=False."""
    net, params, out = forward
    cfg = Config(roi_pack=TINY_ROI)
    net_r = LaneRCNN(cfg.model, remat=True)
    out_r = net_r.apply({"params": params}, batch)
    for k in out:
        np.testing.assert_allclose(out_r[k], out[k], rtol=1e-6, atol=1e-6)

    def loss_fn(n):
        def f(p):
            return roi_loss(n.apply({"params": p}, batch), batch, LossConfig())["loss"]
        return f

    g0 = jax.grad(loss_fn(net))(params)
    g1 = jax.grad(loss_fn(net_r))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_decode_theta_epsilon_numerics():
    """The sign-preserving epsilon on the Decode theta ratio matches the raw
    arctan(p3/p4) wherever |p4| > eps and stays finite at p4 == 0
    (reference lanercnn.py:785-826 divides by a raw network output)."""
    p3 = jnp.array([0.5, -0.3, 1.0, 0.0, 2.0], jnp.float32)
    p4 = jnp.array([1.0, -2.0, 0.0, 0.0, -1e-9], jnp.float32)
    safe = jnp.where(jnp.abs(p4) < 1e-6, jnp.where(p4 < 0, -1e-6, 1e-6), p4)
    theta = jnp.arctan(p3 / safe)
    assert np.all(np.isfinite(np.asarray(theta)))
    ok = np.abs(np.asarray(p4)) > 1e-6
    np.testing.assert_allclose(
        np.asarray(theta)[ok], np.arctan(np.asarray(p3)[ok] / np.asarray(p4)[ok])
    )
    # zero denominator → ±pi/2-ish, sign carried by the numerator
    assert float(theta[2]) == pytest.approx(np.pi / 2, abs=1e-4)
