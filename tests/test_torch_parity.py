"""Per-layer activation parity vs independently-built torch modules.

The reference is torch; the north star requires allclose per-layer parity
(SURVEY.md §4). The reference itself cannot be imported here (it needs the
argoverse package), so each test builds the published block structure
directly from torch.nn primitives — bias-free matmuls + GroupNorm(1, C) +
ReLU residual blocks — loads our flax params into it, and compares.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from lanegcn_tpu.config import ModelConfig, relation_names
from lanegcn_tpu.graph import EdgeSet, LaneGraphBatch
from lanegcn_tpu.models.layers import Conv1dBlock, Linear, LinearRes, Res1d
from lanegcn_tpu.models.actor_net import ActorNet
from lanegcn_tpu.models.map_net import LaneConvStack
from lanegcn_tpu.models.fusion import Att

torch.manual_seed(0)


def t(x):
    return torch.from_numpy(np.asarray(x))


def torch_linear_block(p, x, act=True):
    """our Linear: Dense(no bias) + GN(1) + optional ReLU."""
    y = x @ t(p["linear"]["kernel"])
    y = F.group_norm(y, 1, t(p["norm"]["weight"]), t(p["norm"]["bias"]))
    return F.relu(y) if act else y


def torch_linear_res(p, x):
    y = x @ t(p["linear1"]["kernel"])
    y = F.group_norm(y, 1, t(p["norm1"]["weight"]), t(p["norm1"]["bias"]))
    y = F.relu(y)
    y = y @ t(p["linear2"]["kernel"])
    y = F.group_norm(y, 1, t(p["norm2"]["weight"]), t(p["norm2"]["bias"]))
    if "transform_linear" in p:
        x = x @ t(p["transform_linear"]["kernel"])
        x = F.group_norm(x, 1, t(p["transform_norm"]["weight"]), t(p["transform_norm"]["bias"]))
    return F.relu(y + x)


def torch_conv_block(p, x, stride=1, act=False):
    """x: [N, L, C] → conv(channels-first) → GN over (C, L) → back."""
    w = t(p["kernel"]).permute(2, 1, 0)  # [K, Cin, Cout] → [Cout, Cin, K]
    k = w.shape[-1]
    y = F.conv1d(x.transpose(1, 2), w, stride=stride, padding=(k - 1) // 2)
    y = F.group_norm(y, 1, t(p["norm"]["weight"]), t(p["norm"]["bias"]))
    if act:
        y = F.relu(y)
    return y.transpose(1, 2)


def torch_res1d(p, x, stride=1):
    w1 = t(p["conv1_kernel"]).permute(2, 1, 0)
    w2 = t(p["conv2_kernel"]).permute(2, 1, 0)
    xt = x.transpose(1, 2)
    y = F.conv1d(xt, w1, stride=stride, padding=1)
    y = F.group_norm(y, 1, t(p["bn1"]["weight"]), t(p["bn1"]["bias"]))
    y = F.relu(y)
    y = F.conv1d(y, w2, padding=1)
    y = F.group_norm(y, 1, t(p["bn2"]["weight"]), t(p["bn2"]["bias"]))
    if "downsample_kernel" in p:
        wd = t(p["downsample_kernel"]).permute(2, 1, 0)
        xt = F.conv1d(xt, wd, stride=stride)
        xt = F.group_norm(xt, 1, t(p["downsample_norm"]["weight"]), t(p["downsample_norm"]["bias"]))
    return F.relu(y + xt).transpose(1, 2)


RTOL, ATOL = 1e-4, 1e-4


def test_linear_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(17, 64)).astype(np.float32)
    mod = Linear(128)
    params = mod.init(jax.random.PRNGKey(1), jnp.array(x))["params"]
    ours = mod.apply({"params": params}, jnp.array(x))
    ref = torch_linear_block(params, t(x), act=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("n_in,n_out", [(128, 128), (64, 128)])
def test_linear_res_parity(n_in, n_out):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(9, n_in)).astype(np.float32)
    mod = LinearRes(n_out)
    params = mod.init(jax.random.PRNGKey(2), jnp.array(x))["params"]
    ours = mod.apply({"params": params}, jnp.array(x))
    ref = torch_linear_res(params, t(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("stride", [1, 2])
def test_res1d_parity(stride):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 20, 32)).astype(np.float32)
    mod = Res1d(64, stride=stride)
    params = mod.init(jax.random.PRNGKey(3), jnp.array(x))["params"]
    ours = mod.apply({"params": params}, jnp.array(x))
    ref = torch_res1d(params, t(x), stride=stride)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_actor_net_parity():
    """Full FPN: groups → laterals → interpolate-add → output → last step."""
    cfg = ModelConfig()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(11, 20, 3)).astype(np.float32)
    mod = ActorNet(cfg)
    params = mod.init(jax.random.PRNGKey(4), jnp.array(x))["params"]
    ours = mod.apply({"params": params}, jnp.array(x))

    xt = t(x)
    outputs = []
    out = xt
    for i in range(3):
        out = torch_res1d(params[f"group{i}_block0"], out, stride=1 if i == 0 else 2)
        out = torch_res1d(params[f"group{i}_block1"], out)
        outputs.append(out)
    out = torch_conv_block(params["lateral2"], outputs[2])
    for i in (1, 0):
        out = F.interpolate(
            out.transpose(1, 2), scale_factor=2, mode="linear", align_corners=False
        ).transpose(1, 2)
        out = out + torch_conv_block(params[f"lateral{i}"], outputs[i])
    out = torch_res1d(params["output"], out)[:, -1, :]
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), rtol=5e-4, atol=5e-4)


def _rand_edges(rng, num_u, num_v, cap, num_valid):
    u = rng.integers(0, num_u, size=cap).astype(np.int32)
    v = rng.integers(0, num_v, size=cap).astype(np.int32)
    mask = np.zeros(cap, bool)
    mask[:num_valid] = True
    return EdgeSet(u=jnp.array(u), v=jnp.array(v), mask=jnp.array(mask))


def test_att_parity():
    """Att vs a torch index_add_ implementation of the same dataflow
    (reference lanegcn.py:662-710)."""
    rng = np.random.default_rng(4)
    a, c, e_cap, e_val = 20, 30, 64, 50
    n_agt, n_ctx = 128, 128
    agts = rng.normal(size=(a, n_agt)).astype(np.float32)
    agt_ctrs = rng.uniform(-10, 10, size=(a, 2)).astype(np.float32)
    ctx = rng.normal(size=(c, n_ctx)).astype(np.float32)
    ctx_ctrs = rng.uniform(-10, 10, size=(c, 2)).astype(np.float32)
    edges = _rand_edges(rng, a, c, e_cap, e_val)

    mod = Att(n_agt, n_ctx)
    params = mod.init(
        jax.random.PRNGKey(5), jnp.array(agts), jnp.array(agt_ctrs),
        jnp.array(ctx), jnp.array(ctx_ctrs), edges,
    )["params"]
    ours = mod.apply(
        {"params": params}, jnp.array(agts), jnp.array(agt_ctrs),
        jnp.array(ctx), jnp.array(ctx_ctrs), edges,
    )

    hi = t(np.asarray(edges.u))[: e_val].long()
    wi = t(np.asarray(edges.v))[: e_val].long()
    agts_t, ctx_t = t(agts), t(ctx)
    d = t(agt_ctrs)[hi] - t(ctx_ctrs)[wi]
    dist = F.relu(d @ t(params["dist_dense"]["kernel"]) + t(params["dist_dense"]["bias"]))
    dist = torch_linear_block(params["dist_out"], dist, act=True)
    query = torch_linear_block(params["query"], agts_t, act=True)[hi]
    cat = torch.cat([dist, query, ctx_t[wi]], dim=1)
    cat = torch_linear_block(params["ctx_hidden"], cat, act=True)
    cat = cat @ t(params["ctx_out"]["kernel"])
    out = agts_t @ t(params["agt"]["kernel"])
    out.index_add_(0, hi, cat)
    out = F.group_norm(out, 1, t(params["norm"]["weight"]), t(params["norm"]["bias"]))
    out = F.relu(out)
    out = torch_linear_block(params["linear"], out, act=False)
    out = F.relu(out + agts_t)
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), rtol=5e-4, atol=5e-4)


def test_lane_conv_parity():
    """One LaneConvStack layer vs torch per-relation index_add_
    (reference lanegcn.py:329-362)."""
    rng = np.random.default_rng(5)
    cfg = ModelConfig(num_scales=2)
    names = relation_names(cfg.num_scales)
    n, c = 40, 128
    feat = rng.normal(size=(n, c)).astype(np.float32)

    edges = {}
    for nm in names:
        edges[nm] = _rand_edges(rng, n, n, 32, 20)
    graph = LaneGraphBatch(
        ctrs=jnp.zeros((n, 2)), feats=jnp.zeros((n, 2)), turn=jnp.zeros((n, 2)),
        control=jnp.zeros(n), intersect=jnp.zeros(n),
        node_mask=jnp.ones(n, bool), node_scen=jnp.zeros(n, jnp.int32), edges=edges,
    )
    mod = LaneConvStack(cfg, num_layers=1)
    params = mod.init(jax.random.PRNGKey(6), jnp.array(feat), graph.edges)["params"]
    ours = mod.apply({"params": params}, jnp.array(feat), graph.edges)

    ft = t(feat)
    temp = ft @ t(params["ctr_0"]["kernel"])
    w_rel = t(params["rel_kernel_0"])
    for r, nm in enumerate(names):
        e = edges[nm]
        m = np.asarray(e.mask)
        u = t(np.asarray(e.u)[m]).long()
        v = t(np.asarray(e.v)[m]).long()
        temp.index_add_(0, u, ft[v] @ w_rel[r])
    y = F.group_norm(temp, 1, t(params["norm_0"]["weight"]), t(params["norm_0"]["bias"]))
    y = F.relu(y)
    y = torch_linear_block(params["ctr2_0"], y, act=False)
    y = F.relu(y + ft)
    np.testing.assert_allclose(np.asarray(ours), y.numpy(), rtol=5e-4, atol=5e-4)
