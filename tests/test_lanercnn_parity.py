"""LaneRCNN activation parity vs an independently-built torch pipeline.

Mirrors tests/test_full_net_parity.py for the LaneRCNN family (reference
lanercnn.py): LaneInput → LaneRoI → Interactor → LaneRoI → Decode, with the
sequential greedy NMS (reference nms_select lanercnn.py:687-708) implemented
as a plain python loop on the torch side — so the fixed-K masked-argmax
reformulation in models/lanercnn.py:segmented_nms is checked against the
true sequential semantics inside a real forward pass, and the quadratic
trajectory fit (compute_coefficent / sample_trajectory, lanercnn.py:710-737)
against a direct transcription of the published formulas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from lanegcn_tpu.config import Config, ModelConfig, RoiPackConfig, relation_names
from lanegcn_tpu.data import make_synthetic_scenario
from lanegcn_tpu.data.lane_roi import generate_lane_rois
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.lanercnn import (
    Decode,
    LaneRCNN,
    _quad_coefficients,
    _sample_traj,
)

from tests.test_full_net_parity import _torch_lane_conv_stack
from tests.test_torch_parity import t, torch_linear_block

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
def packs():
    scens = []
    for i in range(2):
        s = make_synthetic_scenario(seed=60 + i, num_corridors=2, num_actors=6)
        scens.append(generate_lane_rois(s))
    cfg = Config(roi_pack=TINY_ROI)
    banded, stats_b = pack_roi_batch(scens, cfg.roi_pack, cfg.model, split_bands=True)
    flat, stats_f = pack_roi_batch(
        scens, cfg.roi_pack, cfg.model, split_bands=False, split_tables=False
    )
    assert stats_b["packed_scenarios"] == 2 and stats_f["packed_scenarios"] == 2
    return cfg.model, jax.tree.map(jnp.asarray, banded), jax.tree.map(jnp.asarray, flat)


def _torch_lane_pooling(p, ctx_feat, ctx_pose, tgt_feat, tgt_pose, edges):
    m = np.asarray(edges.mask)
    u = t(np.asarray(edges.u)[m]).long()
    v = t(np.asarray(edges.v)[m]).long()
    d = ctx_pose[v] - tgt_pose[u]
    dist = F.relu(d @ t(p["relpose"]["kernel"]) + t(p["relpose"]["bias"]))
    ctx = torch.cat([ctx_feat[v], dist], dim=1)
    ctx = torch_linear_block(p["ctx_hidden"], ctx, act=True)
    ctx = ctx @ t(p["ctx_out"]["kernel"])
    tgt = tgt_feat @ t(p["input"]["kernel"])
    tgt.index_add_(0, u, ctx)
    tgt = F.group_norm(tgt, 1, t(p["norm"]["weight"]), t(p["norm"]["bias"]))
    tgt = F.relu(tgt)
    tgt = torch_linear_block(p["mlp1"], tgt, act=True)
    tgt = torch_linear_block(p["mlp2"], tgt, act=False)
    return F.relu(tgt + tgt_feat)


def _torch_greedy_nms(xy, logits, seg, mask, num_seg, k=6, threshold=2.0):
    """Sequential greedy NMS, reference nms_select semantics
    (lanercnn.py:687-708): highest logit, suppress within threshold, fall
    back to highest-logit unchosen when everything is suppressed."""
    picks = np.zeros((num_seg, k), np.int64)
    for b in range(num_seg):
        nodes = np.nonzero(mask & (seg == b))[0]
        if len(nodes) == 0:
            continue
        suppressed: set = set()
        chosen: list = []
        for _ in range(k):
            cands = [i for i in nodes if i not in suppressed and i not in chosen]
            if not cands:
                cands = [i for i in nodes if i not in chosen]
            pick = max(cands, key=lambda i: logits[i])
            chosen.append(pick)
            d = np.sqrt(((xy[nodes] - xy[pick]) ** 2).sum(1))
            suppressed.update(nodes[d < threshold].tolist())
        picks[b] = chosen
    return picks


def _torch_decode(p, roi_feat, batch, mcfg):
    k, t_pred = mcfg.num_mods, mcfg.num_preds
    b = batch.agt_ctrs.shape[0]
    t_hist = batch.agt_trajs.shape[1]

    int_idx = t(np.asarray(batch.int_node_idx)).long()
    int_feats = roi_feat[int_idx]
    h = torch_linear_block(p["pred_hidden"], int_feats, act=True)
    pred = h @ t(p["pred_out"]["kernel"]) + t(p["pred_out"]["bias"])

    anchors = t(np.asarray(batch.node_feats))[int_idx]
    anc_ctrs = anchors[:, :2]
    anc_dirs = anchors[:, 2:4]
    anc_theta = torch.atan2(anc_dirs[:, 1], anc_dirs[:, 0])
    logits = pred[:, 0]
    pred_xy = anc_ctrs + pred[:, 1:3]
    pred_theta = anc_theta + torch.atan(pred[:, 3] / pred[:, 4])

    sel = _torch_greedy_nms(
        pred_xy.detach().numpy(),
        logits.detach().numpy(),
        np.asarray(batch.int_node_scen),
        np.asarray(batch.int_node_mask),
        b,
        k,
    )
    sel_t = torch.from_numpy(sel)
    pred_ctrs = pred_xy[sel_t]
    pred_thetas = pred_theta[sel_t]
    pred_logits = logits[sel_t]
    pred_dirs = torch.stack([torch.cos(pred_thetas), torch.sin(pred_thetas)], dim=-1)

    agt_ctrs = t(np.asarray(batch.agt_ctrs))
    agt_dirs = t(np.asarray(batch.agt_dirs))
    agt_vels = t(np.asarray(batch.agt_vels))

    # Quadratic fit (reference compute_coefficent lanercnn.py:710-723).
    ax, ay = agt_ctrs[:, None, 0], agt_ctrs[:, None, 1]
    adx, ady = agt_dirs[:, None, 0], agt_dirs[:, None, 1]
    a1 = (2 * pred_ctrs[:, :, 0] * adx + 2 * ax * adx) / (2 + adx - pred_dirs[:, :, 0])
    a0 = pred_ctrs[:, :, 0] - ax - a1
    a2 = ax.expand(-1, k)
    b1 = (2 * pred_ctrs[:, :, 1] * ady + 2 * ay * ady) / (2 + ady - pred_dirs[:, :, 1])
    b0 = pred_ctrs[:, :, 1] - ay - b1
    b2 = ay.expand(-1, k)
    a0, a1, a2, b0, b1, b2 = (x[:, :, None] for x in (a0, a1, a2, b0, b1, b2))

    def sample(s):
        return torch.stack([a0 * s ** 2 + a1 * s + a2, b0 * s ** 2 + b1 * s + b2], dim=-1)

    def sample_d1(s):
        return torch.stack([2 * a0 * s + a1, 2 * b0 * s + b1], dim=-1)

    s31 = (1.0 / t_pred) * torch.arange(0, t_pred + 1).float()
    trajs31 = sample(s31[None, None, :])
    seg_d = trajs31[:, :, 1:] - trajs31[:, :, :-1]
    curve_len = torch.sqrt((seg_d ** 2).sum(-1)).sum(-1)
    accs = 2 * (curve_len - agt_vels[:, None] * 3.0) / 9.0
    t31 = 0.1 * torch.arange(0, t_pred + 1).float()
    v = agt_vels[:, None, None] + accs[:, :, None] * t31
    v = torch.clamp(v, min=0.0)
    s_abs = (v[:, :, 0:1] + v[:, :, 1:]) * t31[1:] / 2
    s_max = s_abs.max(dim=2, keepdim=True).values
    s_norm = torch.where(s_max > 0, s_abs / torch.where(s_max == 0, torch.ones(()), s_max), s_abs)
    s_norm = torch.where(s_norm == 0.0, torch.ones(()), s_norm)

    traj_pts = t(np.asarray(batch.agt_trajs)).reshape(b * t_hist, 2)
    traj_dirs = t(np.asarray(batch.agt_traj_dirs)).reshape(b * t_hist, 2)
    agt_emb = F.relu(traj_pts @ t(p["agt1_dense"]["kernel"]) + t(p["agt1_dense"]["bias"]))
    agt_emb = torch_linear_block(p["agt1_out"], agt_emb, act=False)
    agt_emb2 = F.relu(traj_dirs @ t(p["agt2_dense"]["kernel"]) + t(p["agt2_dense"]["bias"]))
    agt_emb2 = torch_linear_block(p["agt2_out"], agt_emb2, act=False)
    agt_feat = F.relu(agt_emb + agt_emb2)

    ctx_pose = torch.cat([traj_pts, traj_dirs], dim=-1)
    tgt_pose = torch.cat([anc_ctrs, anc_dirs], dim=-1)
    int_feats = _torch_lane_pooling(
        p["lane_pool"], agt_feat, ctx_pose, int_feats, tgt_pose, batch.a2r
    )

    traj_feats = int_feats[sel_t]
    rh = torch_linear_block(p["refine_hidden"], traj_feats.reshape(b * k, -1), act=True)
    delta = rh @ t(p["refine_out"]["kernel"]) + t(p["refine_out"]["bias"])
    delta = delta.reshape(b, k, t_pred, 2)

    s_abs2 = s_abs + delta[:, :, :, 0]
    s_max2 = s_abs2.max(dim=2, keepdim=True).values
    s_norm2 = torch.where(
        s_max2 != 0, s_abs2 / torch.where(s_max2 == 0, torch.ones(()), s_max2), s_abs2
    )
    s_norm2 = torch.where(s_norm2 == 0.0, torch.ones(()), s_norm2)

    dxy = sample_d1(s_norm2)
    norm_dxy = torch.stack([-dxy[..., 1], dxy[..., 0]], dim=-1)
    shift = norm_dxy * delta[:, :, :, 1:2]
    trajs = sample(s_norm2) + shift
    return pred_logits, pred_ctrs, trajs


def _torch_lanercnn(params, flat, mcfg):
    names = relation_names(mcfg.num_scales)
    # LaneInput (lanercnn.py:280-351).
    p = params["input"]
    node_feats = t(np.asarray(flat.node_feats))
    feat = node_feats @ t(p["map_fc"]["kernel"])
    agt = t(np.asarray(flat.agent_feat)) @ t(p["agt_fc"]["kernel"])
    m = np.asarray(flat.a2m.mask)
    u = t(np.asarray(flat.a2m.u)[m]).long()
    v = t(np.asarray(flat.a2m.v)[m]).long()
    feat.index_add_(0, v, agt[u])
    feat = F.group_norm(feat, 1, t(p["bn"]["weight"]), t(p["bn"]["bias"]))
    feat = F.relu(feat)

    # LaneRoI 1.
    feat = torch_linear_block(params["roi_net1"]["input"], feat, act=True)
    feat = _torch_lane_conv_stack(
        params["roi_net1"]["fuse"], feat, flat.edges, names, mcfg.num_fuse_layers
    )

    # Interactor (lanercnn.py:603-642).
    ip = params["interactor"]
    g = flat.graph
    emb = F.relu(t(np.asarray(g.ctrs)) @ t(ip["input_dense"]["kernel"]) + t(ip["input_dense"]["bias"]))
    emb = torch_linear_block(ip["input_out"], emb, act=False)
    seg = F.relu(t(np.asarray(g.feats)) @ t(ip["seg_dense"]["kernel"]) + t(ip["seg_dense"]["bias"]))
    seg = torch_linear_block(ip["seg_out"], seg, act=False)
    graph_input = F.relu(emb + seg)
    roi_pose = node_feats[:, :4]
    graph_pose = torch.cat([t(np.asarray(g.ctrs)), t(np.asarray(g.feats))], dim=-1)
    graph_feat = _torch_lane_pooling(
        ip["roi2graph"], feat, roi_pose, graph_input, graph_pose, flat.r2g
    )
    graph_feat = _torch_lane_conv_stack(
        ip["global_graph"], graph_feat, g.edges, names, mcfg.num_fuse_layers
    )
    feat = _torch_lane_pooling(
        ip["graph2roi"], graph_feat, graph_pose, feat, roi_pose, flat.g2r
    )

    # LaneRoI 2.
    feat = torch_linear_block(params["roi_net2"]["input"], feat, act=True)
    feat = _torch_lane_conv_stack(
        params["roi_net2"]["fuse"], feat, flat.edges, names, mcfg.num_fuse_layers
    )

    return _torch_decode(params["decode"], feat, flat, mcfg)


def test_quad_fit_reference_formulas():
    """_quad_coefficients/_sample_traj vs a direct numpy transcription of the
    reference's closed-form curve fit (lanercnn.py:710-731)."""
    rng = np.random.default_rng(17)
    b, k = 4, 6
    agt_ctrs = rng.normal(size=(b, 2)).astype(np.float32)
    agt_dirs = rng.normal(size=(b, 2)).astype(np.float32)
    pred_ctrs = rng.normal(scale=10, size=(b, k, 2)).astype(np.float32)
    th = rng.uniform(-np.pi, np.pi, size=(b, k)).astype(np.float32)
    pred_dirs = np.stack([np.cos(th), np.sin(th)], axis=-1)

    coef = _quad_coefficients(
        jnp.array(agt_ctrs), jnp.array(agt_dirs), jnp.array(pred_ctrs), jnp.array(pred_dirs), k
    )
    s = np.linspace(0, 1, 30, dtype=np.float32)
    ours = np.asarray(_sample_traj(jnp.array(s)[None, None, :], *coef))

    ax, ay = agt_ctrs[:, :1], agt_ctrs[:, 1:2]
    adx, ady = agt_dirs[:, :1], agt_dirs[:, 1:2]
    a1 = (2 * pred_ctrs[:, :, 0] * adx + 2 * ax * adx) / (2 + adx - pred_dirs[:, :, 0])
    a0 = pred_ctrs[:, :, 0] - ax - a1
    b1 = (2 * pred_ctrs[:, :, 1] * ady + 2 * ay * ady) / (2 + ady - pred_dirs[:, :, 1])
    b0 = pred_ctrs[:, :, 1] - ay - b1
    x = a0[:, :, None] * s ** 2 + a1[:, :, None] * s + ax[:, :, None]
    y = b0[:, :, None] * s ** 2 + b1[:, :, None] * s + ay[:, :, None]
    ref = np.stack([x, y], axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    # Boundary conditions: curve starts at the agent, ends at the goal.
    np.testing.assert_allclose(ours[:, :, 0], np.broadcast_to(agt_ctrs[:, None], (b, k, 2)), atol=1e-4)
    s1 = np.asarray(_sample_traj(jnp.ones((1, 1, 1)), *coef))[:, :, 0]
    np.testing.assert_allclose(s1, pred_ctrs, rtol=1e-3, atol=1e-3)


def test_decode_parity(packs):
    """Standalone Decode (NMS + curve fit + refinement) vs torch."""
    mcfg, banded, _ = packs
    rng = np.random.default_rng(19)
    m = banded.node_feats.shape[0]
    roi_feat = rng.normal(size=(m, mcfg.n_map)).astype(np.float32)
    mod = Decode(mcfg)
    params = mod.init(jax.random.PRNGKey(21), jnp.array(roi_feat), banded)["params"]
    logits, goals, trajs = mod.apply({"params": params}, jnp.array(roi_feat), banded)
    logits_t, goals_t, trajs_t = _torch_decode(params, t(roi_feat), banded, mcfg)

    smask = np.asarray(banded.scen_mask)
    np.testing.assert_allclose(np.asarray(logits)[smask], logits_t.numpy()[smask], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(goals)[smask], goals_t.numpy()[smask], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(trajs)[smask], trajs_t.numpy()[smask], rtol=2e-3, atol=4e-3)


def test_lanercnn_full_net_parity(packs):
    """Full LaneRCNN forward (banded pack) vs torch on the flat edge lists."""
    mcfg, banded, flat = packs
    net = LaneRCNN(mcfg)
    params = net.init(jax.random.PRNGKey(23), banded)["params"]
    out = net.apply({"params": params}, banded)
    logits_t, goals_t, trajs_t = _torch_lanercnn(params, flat, mcfg)

    smask = np.asarray(banded.scen_mask)
    np.testing.assert_allclose(
        np.asarray(out["pred_logics"])[smask], logits_t.numpy()[smask], rtol=3e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_goals"])[smask], goals_t.numpy()[smask], rtol=3e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_trajs"])[smask], trajs_t.numpy()[smask], rtol=3e-3, atol=6e-3
    )
