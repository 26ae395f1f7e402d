"""Whole-model activation parity vs an independently-built torch pipeline.

Extends tests/test_torch_parity.py (per-block) to the full LaneGCN forward —
ActorNet ∥ MapNet → A2M → M2M → M2A → A2A → PredNet → world transform
(reference lanegcn.py:94-151) — plus the loss (PredLoss, lanegcn.py:740-807)
and AGENT metrics (pred_metrics, lanegcn.py:883-899). The torch side is
rebuilt from torch.nn primitives following the published structure and fed
our flax params; it consumes the *unsplit* edge lists, so running our model
on the band-split pack of the same scenarios also proves the banded-roll
LaneConv is exactly the reference edge-list semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from lanegcn_tpu.config import Config, LossConfig, ModelConfig, PackConfig, relation_names
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss
from lanegcn_tpu.models.pred_net import PredNet

from tests.test_torch_parity import (
    t,
    torch_conv_block,
    torch_linear_block,
    torch_linear_res,
    torch_res1d,
)


def _packs():
    """Same scenarios packed twice: band-split (our fast path) and flat
    (full edge lists, consumed by the torch reference)."""
    mcfg = ModelConfig()
    pc = PackConfig(
        max_scenarios=3, max_actors=24, max_nodes=1024,
        max_edges_scale0=2048, max_edges_dilated=2048, max_edges_lr=1024,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=512,
    )
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=5) for i in range(3)]
    banded, stats_b = pack_batch(scens, pc, mcfg, split_bands=True)
    # Fully-flat pack: the torch reference emulation consumes edge lists, so
    # neighbor tables must stay merged into the lists here.
    flat, stats_f = pack_batch(
        scens, pc, mcfg, split_bands=False, split_tables=False
    )
    assert stats_b["packed_scenarios"] == 3 and stats_f["packed_scenarios"] == 3
    assert not any(v for k, v in stats_f.items() if k.startswith("dropped")), stats_f
    return mcfg, banded, flat


def _torch_actor_net(p, feats):
    out = t(feats)
    outputs = []
    for i in range(3):
        out = torch_res1d(p[f"group{i}_block0"], out, stride=1 if i == 0 else 2)
        out = torch_res1d(p[f"group{i}_block1"], out)
        outputs.append(out)
    out = torch_conv_block(p["lateral2"], outputs[2])
    for i in (1, 0):
        out = F.interpolate(
            out.transpose(1, 2), scale_factor=2, mode="linear", align_corners=False
        ).transpose(1, 2)
        out = out + torch_conv_block(p[f"lateral{i}"], outputs[i])
    return torch_res1d(p["output"], out)[:, -1, :]


def _torch_lane_conv_stack(p, feat, edges, names, num_layers=4):
    res = feat
    for i in range(num_layers):
        temp = feat @ t(p[f"ctr_{i}"]["kernel"])
        w_rel = t(p[f"rel_kernel_{i}"])
        for r, nm in enumerate(names):
            e = edges[nm]
            m = np.asarray(e.mask)
            if not m.any():
                continue
            u = t(np.asarray(e.u)[m]).long()
            v = t(np.asarray(e.v)[m]).long()
            temp.index_add_(0, u, feat[v] @ w_rel[r])
        y = F.group_norm(temp, 1, t(p[f"norm_{i}"]["weight"]), t(p[f"norm_{i}"]["bias"]))
        y = F.relu(y)
        y = torch_linear_block(p[f"ctr2_{i}"], y, act=False)
        feat = F.relu(y + res)
        res = feat
    return feat


def _torch_att(p, agts, agt_ctrs, ctx, ctx_ctrs, edges):
    m = np.asarray(edges.mask)
    hi = t(np.asarray(edges.u)[m]).long()
    wi = t(np.asarray(edges.v)[m]).long()
    d = agt_ctrs[hi] - ctx_ctrs[wi]
    dist = F.relu(d @ t(p["dist_dense"]["kernel"]) + t(p["dist_dense"]["bias"]))
    dist = torch_linear_block(p["dist_out"], dist, act=True)
    query = torch_linear_block(p["query"], agts, act=True)[hi]
    cat = torch.cat([dist, query, ctx[wi]], dim=1)
    cat = torch_linear_block(p["ctx_hidden"], cat, act=True)
    cat = cat @ t(p["ctx_out"]["kernel"])
    out = agts @ t(p["agt"]["kernel"])
    out.index_add_(0, hi, cat)
    out = F.group_norm(out, 1, t(p["norm"]["weight"]), t(p["norm"]["bias"]))
    out = F.relu(out)
    out = torch_linear_block(p["linear"], out, act=False)
    return F.relu(out + agts)


def _torch_pred_net(p, actors, actor_ctrs, num_mods, num_preds):
    preds = []
    for i in range(num_mods):
        h = torch_linear_res(p[f"pred{i}_res"], actors)
        preds.append(h @ t(p[f"pred{i}_out"]["kernel"]) + t(p[f"pred{i}_out"]["bias"]))
    reg = torch.stack(preds, dim=1).reshape(actors.shape[0], num_mods, num_preds, 2)
    reg = reg + actor_ctrs[:, None, None, :]

    dest = reg[:, :, -1]
    ad = p["att_dest"]
    d = (actor_ctrs[:, None, :] - dest).reshape(-1, 2)
    dist = F.relu(d @ t(ad["dist_dense"]["kernel"]) + t(ad["dist_dense"]["bias"]))
    dist = torch_linear_block(ad["dist_out"], dist, act=True)
    rep = torch.repeat_interleave(actors, num_mods, dim=0)
    feats = torch_linear_block(ad["agt"], torch.cat([dist, rep], dim=1), act=True)
    h = torch_linear_res(p["cls_res"], feats)
    cls = (h @ t(p["cls_out"]["kernel"]) + t(p["cls_out"]["bias"])).reshape(-1, num_mods)

    order = torch.argsort(-cls, dim=1)
    cls = torch.gather(cls, 1, order)
    reg = torch.gather(reg, 1, order[:, :, None, None].expand(-1, -1, num_preds, 2))
    return cls, reg


def _torch_full_net(params, flat_batch, mcfg):
    names = relation_names(mcfg.num_scales)
    g = flat_batch.graph
    actors = _torch_actor_net(params["actor_net"], np.asarray(flat_batch.actors.feats))

    mp = params["map_net"]
    ctrs = t(np.asarray(g.ctrs))
    nodes = F.relu(ctrs @ t(mp["input_dense"]["kernel"]) + t(mp["input_dense"]["bias"]))
    nodes = torch_linear_block(mp["input_out"], nodes, act=False)
    seg = t(np.asarray(g.feats))
    seg = F.relu(seg @ t(mp["seg_dense"]["kernel"]) + t(mp["seg_dense"]["bias"]))
    seg = torch_linear_block(mp["seg_out"], seg, act=False)
    nodes = F.relu(nodes + seg)
    nodes = _torch_lane_conv_stack(mp["fuse"], nodes, g.edges, names, mcfg.num_fuse_layers)

    actor_ctrs = t(np.asarray(flat_batch.actors.ctrs))
    node_ctrs = t(np.asarray(g.ctrs))
    a2m = params["a2m"]
    meta = torch.cat(
        [t(np.asarray(g.turn)), t(np.asarray(g.control))[:, None], t(np.asarray(g.intersect))[:, None]],
        dim=1,
    )
    nodes = torch_linear_block(a2m["meta"], torch.cat([nodes, meta], dim=1), act=True)
    for i in range(mcfg.num_att_layers):
        nodes = _torch_att(a2m[f"att{i}"], nodes, node_ctrs, actors, actor_ctrs, flat_batch.fusion.a2m)

    nodes = _torch_lane_conv_stack(
        params["m2m"]["fuse"], nodes, g.edges, names, mcfg.num_fuse_layers
    )
    for i in range(mcfg.num_att_layers):
        actors = _torch_att(
            params["m2a"][f"att{i}"], actors, actor_ctrs, nodes, node_ctrs, flat_batch.fusion.m2a
        )
    for i in range(mcfg.num_att_layers):
        actors = _torch_att(
            params["a2a"][f"att{i}"], actors, actor_ctrs, actors, actor_ctrs, flat_batch.fusion.a2a
        )

    cls, reg = _torch_pred_net(
        params["pred_net"], actors, actor_ctrs, mcfg.num_mods, mcfg.num_preds
    )
    scen = t(np.asarray(flat_batch.actors.scen)).long()
    rot = t(np.asarray(flat_batch.rot))[scen]  # [A, 2, 2]
    orig = t(np.asarray(flat_batch.orig))[scen]  # [A, 2]
    reg = torch.einsum("aktc,acd->aktd", reg, rot) + orig[:, None, None, :]
    return cls, reg


def test_pred_net_parity():
    mcfg = ModelConfig()
    rng = np.random.default_rng(7)
    a = 13
    actors = rng.normal(size=(a, mcfg.n_actor)).astype(np.float32)
    ctrs = rng.uniform(-20, 20, size=(a, 2)).astype(np.float32)
    mod = PredNet(mcfg)
    params = mod.init(jax.random.PRNGKey(8), jnp.array(actors), jnp.array(ctrs))["params"]
    cls, reg = mod.apply({"params": params}, jnp.array(actors), jnp.array(ctrs))
    cls_t, reg_t = _torch_pred_net(params, t(actors), t(ctrs), mcfg.num_mods, mcfg.num_preds)
    np.testing.assert_allclose(np.asarray(cls), cls_t.numpy(), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), rtol=5e-4, atol=5e-4)


def test_full_net_parity():
    """Full forward on a real packed batch, banded and flat, vs torch."""
    mcfg, banded, flat = _packs()
    net = LaneGCN(mcfg)
    params = net.init(jax.random.PRNGKey(9), banded)["params"]

    out_band = net.apply({"params": params}, banded)
    out_flat = net.apply({"params": params}, flat)
    cls_t, reg_t = _torch_full_net(params, flat, mcfg)

    amask = np.asarray(banded.actors.mask)
    for out in (out_band, out_flat):
        np.testing.assert_allclose(
            np.asarray(out["cls"])[amask], cls_t.numpy()[amask], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["reg"])[amask], reg_t.numpy()[amask], rtol=2e-3, atol=2e-3
        )


def _torch_pred_loss(cls, reg, gt, has, cfg: LossConfig):
    """Reference PredLoss semantics (lanegcn.py:740-807) on valid rows."""
    t_steps = gt.shape[1]
    last = has.float() + 0.1 * torch.arange(t_steps).float() / float(t_steps)
    max_last, last_idcs = last.max(1)
    mask = max_last > 1.0
    cls, reg, gt, has, last_idcs = cls[mask], reg[mask], gt[mask], has[mask], last_idcs[mask]
    row = torch.arange(len(cls)).long()

    dist = []
    for j in range(cls.shape[1]):
        dist.append(
            torch.sqrt(
                ((reg[row, j, last_idcs] - gt[row, last_idcs]) ** 2).sum(1)
            )
        )
    dist = torch.stack(dist, dim=1)
    min_dist, min_idcs = dist.min(1)

    mgn = cls[row, min_idcs].unsqueeze(1) - cls
    mask0 = (min_dist < cfg.cls_th).view(-1, 1)
    mask1 = dist - min_dist.view(-1, 1) > cfg.cls_ignore
    mgn = mgn[mask0 * mask1]
    m = mgn < cfg.mgn
    num_cls = int(m.sum())
    cls_loss = cfg.cls_coef * (cfg.mgn * m.sum().float() - mgn[m].sum())

    reg_best = reg[row, min_idcs]
    num_reg = int(has.sum())
    reg_loss = cfg.reg_coef * F.smooth_l1_loss(reg_best[has], gt[has], reduction="sum")
    return cls_loss, num_cls, reg_loss, num_reg


def test_pred_loss_reference_semantics():
    mcfg, banded, _ = _packs()
    cfg = Config()
    rng = np.random.default_rng(11)
    a = banded.actors.capacity
    k, tp = mcfg.num_mods, mcfg.num_preds
    cls = rng.normal(size=(a, k)).astype(np.float32)
    reg = rng.normal(scale=3.0, size=(a, k, tp, 2)).astype(np.float32)
    # World-frame gt: rotate packed gt like the Net's outputs.
    out = {"cls": jnp.array(cls), "reg": jnp.array(reg)}
    ours = pred_loss(out, banded, cfg.loss)

    amask = np.asarray(banded.actors.mask)
    cls_t, num_cls, reg_t, num_reg = _torch_pred_loss(
        t(cls[amask]),
        t(reg[amask]),
        t(np.asarray(banded.gt_preds)[amask]),
        t(np.asarray(banded.has_preds)[amask]),
        cfg.loss,
    )
    assert int(ours["num_cls"]) == num_cls
    assert int(ours["num_reg"]) == num_reg
    np.testing.assert_allclose(float(ours["cls_loss"]), float(cls_t), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ours["reg_loss"]), float(reg_t), rtol=1e-5, atol=2e-4)


def test_agent_metrics_reference_semantics():
    """ADE/FDE/MR sums vs a direct numpy transcription of pred_metrics
    (reference lanegcn.py:883-899: err over AGENT rows, min-FDE mode)."""
    mcfg, banded, _ = _packs()
    rng = np.random.default_rng(13)
    a = banded.actors.capacity
    k, tp = mcfg.num_mods, mcfg.num_preds
    out = {
        "cls": jnp.array(rng.normal(size=(a, k)).astype(np.float32)),
        "reg": jnp.array(rng.normal(scale=3.0, size=(a, k, tp, 2)).astype(np.float32)),
    }
    ours = agent_metrics(out, banded)

    idx = np.asarray(banded.agent_idx)
    smask = np.asarray(banded.scen_mask)
    reg = np.asarray(out["reg"])[idx][smask]
    gt = np.asarray(banded.gt_preds)[idx][smask]
    err = np.sqrt(((reg - gt[:, None]) ** 2).sum(3))  # [B, K, T]
    ade1 = err[:, 0].mean(1).sum()
    fde1 = err[:, 0, -1].sum()
    best = err[np.arange(len(err)), err[:, :, -1].argmin(1)]
    np.testing.assert_allclose(float(ours["ade1_sum"]), ade1, rtol=1e-5)
    np.testing.assert_allclose(float(ours["fde1_sum"]), fde1, rtol=1e-5)
    np.testing.assert_allclose(float(ours["ade_sum"]), best.mean(1).sum(), rtol=1e-5)
    np.testing.assert_allclose(float(ours["fde_sum"]), best[:, -1].sum(), rtol=1e-5)
    np.testing.assert_allclose(float(ours["mr_sum"]), (best[:, -1] > 2.0).sum(), rtol=1e-5)
    assert int(ours["num_scen"]) == int(smask.sum())
