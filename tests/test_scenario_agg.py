"""Scenario-blocked overflow aggregation (ops/pallas_scenario_agg) + the
strided-packer plan: kernel parity (interpret mode) against the XLA
reference, gradient parity of the hand-written VJP, packer invariants, and
full-model loss equivalence between the contiguous and strided layouts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanegcn_tpu.config import Config, ModelConfig, PackConfig, relation_names
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.ops.pallas_scenario_agg import scenario_aggregate, xla_reference

S, STRIDE, C, ECAP, R = 4, 64, 128, 64, 14
N = S * STRIDE


def _random_case(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(N, C) * 0.1, dtype)
    temp = jnp.asarray(rng.randn(N, C) * 0.1, dtype)
    w = jnp.asarray(rng.randn(R, C, C) * 0.05, dtype)
    lu = np.full((S, ECAP), -1, np.int32)
    lv = np.full((S, ECAP), -1, np.int32)
    rel = np.full((S, ECAP), -1, np.int32)
    for s in range(S):
        k = rng.randint(10, ECAP)  # ragged valid counts, padding after
        lu[s, :k] = rng.randint(0, 50, k)
        lv[s, :k] = rng.randint(0, 50, k)
        rel[s, :k] = rng.randint(0, R, k)
    args = (
        feat, temp, w,
        jnp.asarray(lu.reshape(-1, 1)),
        jnp.asarray(lv.reshape(-1, 1)),
        jnp.asarray(rel.reshape(-1, 1)),
    )
    return args


def test_forward_parity_interpret_vs_xla():
    args = _random_case(0)
    out_k = scenario_aggregate(*args, num_scen=S, mode="interpret")
    out_x = scenario_aggregate(*args, num_scen=S, mode="xla")
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_forward_empty_plan():
    feat, temp, w, lu, lv, rel = _random_case(1)
    lu = jnp.full_like(lu, -1)
    lv = jnp.full_like(lv, -1)
    rel = jnp.full_like(rel, -1)
    out = scenario_aggregate(feat, temp, w, lu, lv, rel, num_scen=S, mode="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(temp), atol=1e-6)


def test_gradient_parity_interpret_vs_xla():
    args = _random_case(2)

    def loss(mode):
        def f(feat, temp, w):
            out = scenario_aggregate(
                feat, temp, w, *args[3:], num_scen=S, mode=mode
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_k = jax.grad(loss("interpret"), argnums=(0, 1, 2))(*args[:3])
    g_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(*args[:3])
    for a, b, nm in zip(g_k, g_x, ("feat", "temp", "w")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=nm,
        )


def _grouped_case(seed=0, dtype=jnp.float32):
    """Hand-built GROUP-ALIGNED plan: per window, left/right edges
    (relations 12/13) fill chunk 0, dilated relations start at chunk 1 —
    build_window_plan's layout for plan_cap >= GROUPED_MIN_CAP."""
    from lanegcn_tpu.ops.pallas_scenario_agg import _CHUNK

    S2, ECAP2 = 2, 2 * _CHUNK
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(S2 * STRIDE, C) * 0.1, dtype)
    temp = jnp.asarray(rng.randn(S2 * STRIDE, C) * 0.1, dtype)
    w = jnp.asarray(rng.randn(R, C, C) * 0.05, dtype)
    lu = np.full((S2, ECAP2), -1, np.int32)
    lv = np.full((S2, ECAP2), -1, np.int32)
    rel = np.full((S2, ECAP2), -1, np.int32)
    for s in range(S2):
        ka = rng.randint(5, _CHUNK)       # group A: left/right in chunk 0
        kb = rng.randint(5, _CHUNK)       # group B: dilated from chunk 1
        lu[s, :ka] = rng.randint(0, STRIDE, ka)
        lv[s, :ka] = rng.randint(0, STRIDE, ka)
        rel[s, :ka] = rng.randint(12, 14, ka)
        lu[s, _CHUNK : _CHUNK + kb] = rng.randint(0, STRIDE, kb)
        lv[s, _CHUNK : _CHUNK + kb] = rng.randint(0, STRIDE, kb)
        rel[s, _CHUNK : _CHUNK + kb] = rng.randint(0, 12, kb)
    args = (
        feat, temp, w,
        jnp.asarray(lu.reshape(-1, 1)),
        jnp.asarray(lv.reshape(-1, 1)),
        jnp.asarray(rel.reshape(-1, 1)),
    )
    groups = ((12, 13), tuple(range(12)))
    return args, S2, groups


def test_grouped_forward_parity():
    args, S2, groups = _grouped_case(5)
    out_k = scenario_aggregate(*args, num_scen=S2, mode="interpret", groups=groups)
    out_x = scenario_aggregate(*args, num_scen=S2, mode="xla")
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_grouped_gradient_parity():
    args, S2, groups = _grouped_case(6)

    def loss(mode, g):
        def f(feat, temp, w):
            out = scenario_aggregate(
                feat, temp, w, *args[3:], num_scen=S2, mode=mode, groups=g
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_k = jax.grad(loss("interpret", groups), argnums=(0, 1, 2))(*args[:3])
    g_x = jax.grad(loss("xla", None), argnums=(0, 1, 2))(*args[:3])
    for a, b, nm in zip(g_k, g_x, ("feat", "temp", "w")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=2e-4, err_msg=nm,
        )


def test_packer_group_alignment_invariant():
    """build_window_plan with plan_cap >= GROUPED_MIN_CAP must emit
    group-pure chunks: per window, every left/right edge sits in a chunk
    strictly before the first dilated edge's chunk, and the dilated run
    starts on a chunk boundary — the grouped kernel's correctness
    invariant (a violation silently drops edges)."""
    from lanegcn_tpu.ops.pallas_scenario_agg import _CHUNK, GROUPED_MIN_CAP

    cfg = PackConfig(
        max_scenarios=8, max_actors=96, max_nodes=12 * 384, node_stride=384,
        max_plan_edges=GROUPED_MIN_CAP, table_relations=(),
        max_edges_scale0=512, max_edges_dilated=768, max_edges_lr=128,
        max_a2m_edges=768, max_m2a_edges=768, max_a2a_edges=256,
    )
    from lanegcn_tpu.data.synthetic import make_urban_scenario

    mc = ModelConfig()
    # Urban junction graphs: both left/right AND dilated cross-lane residue
    # land in the plan (corridor graphs put only left/right there).
    scens = [
        make_urban_scenario(seed=300 + i, num_corridors=3, num_actors=6)
        for i in range(8)
    ]
    b, st = pack_batch(scens, cfg, mc)
    names = relation_names(mc.num_scales)
    lr_ids = {r for r, nm in enumerate(names) if nm in ("left", "right")}
    S_w = b.graph.plan_scen
    ecap = np.asarray(b.graph.plan_lu).shape[0] // S_w
    rel = np.asarray(b.graph.plan_rel).reshape(S_w, ecap)
    lu = np.asarray(b.graph.plan_lu).reshape(S_w, ecap)
    saw_grouped_window = False
    for w in range(S_w):
        valid = np.nonzero(lu[w] >= 0)[0]
        if len(valid) == 0:
            continue
        a_slots = valid[np.isin(rel[w][valid], list(lr_ids))]
        b_slots = valid[~np.isin(rel[w][valid], list(lr_ids))]
        if len(a_slots) and len(b_slots):
            saw_grouped_window = True
            assert a_slots.max() < b_slots.min()
            assert b_slots.min() % _CHUNK == 0, (w, b_slots.min())
            # chunk purity
            assert (a_slots // _CHUNK).max() < (b_slots // _CHUNK).min()
    assert saw_grouped_window, "test graphs produced no grouped windows"


def _pack_cfgs():
    base = dict(
        max_scenarios=4, max_actors=48,
        max_edges_scale0=512, max_edges_dilated=768, max_edges_lr=128,
        max_a2m_edges=768, max_m2a_edges=768, max_a2a_edges=256,
    )
    contig = PackConfig(max_nodes=4 * 384, **base)
    # window-aligned first-fit needs headroom for alignment jumps
    strided = PackConfig(
        max_nodes=6 * 384, node_stride=384, max_plan_edges=256, **base
    )
    return contig, strided


def _scens(n=4):
    return [
        make_synthetic_scenario(seed=100 + i, num_corridors=2, num_actors=6)
        for i in range(n)
    ]


def test_windowed_pack_invariants():
    contig_cfg, strided_cfg = _pack_cfgs()
    stride = strided_cfg.node_stride
    mc = ModelConfig()
    scens = _scens()
    b_c, st_c = pack_batch(scens, contig_cfg, mc)
    b_s, st_s = pack_batch(scens, strided_cfg, mc)
    assert st_s["packed_scenarios"] == st_c["packed_scenarios"]
    # plan + classic lists account for every overflow edge
    classic_valid = sum(int(np.sum(e.mask)) for e in b_s.graph.edges.values())
    total_c = sum(int(np.sum(e.mask)) for e in b_c.graph.edges.values())
    plan_valid = int(np.sum(np.asarray(b_s.graph.plan_lu) >= 0))
    assert plan_valid + classic_valid == total_c, (plan_valid, classic_valid, total_c)
    assert st_s["plan_edges"] == plan_valid
    assert b_s.graph.plan_scen == strided_cfg.max_nodes // stride
    # planned edges connect real nodes of the same scenario within a window
    lu = np.asarray(b_s.graph.plan_lu).reshape(b_s.graph.plan_scen, -1)
    lv = np.asarray(b_s.graph.plan_lv).reshape(b_s.graph.plan_scen, -1)
    rl = np.asarray(b_s.graph.plan_rel)[:, 0]
    mask = np.asarray(b_s.graph.node_mask)
    node_scen = np.asarray(b_s.graph.node_scen)
    for w in range(b_s.graph.plan_scen):
        valid = lu[w] >= 0
        if not valid.any():
            continue
        u_glob = w * stride + lu[w][valid]
        v_glob = w * stride + lv[w][valid]
        assert mask[u_glob].all() and mask[v_glob].all()
        assert (node_scen[u_glob] == node_scen[v_glob]).all()
    valid = np.asarray(b_s.graph.plan_lu)[:, 0] >= 0
    assert (rl[valid] >= 0).all() and (
        rl[valid] < len(relation_names(mc.num_scales))
    ).all()


@pytest.mark.parametrize("agg_mode", ["xla", "interpret"])
def test_model_loss_matches_contiguous_layout(agg_mode):
    """Same scenarios, strided+plan pack vs contiguous pack: identical loss
    and metrics through the full LaneGCN net (row layout is internal)."""
    from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss

    contig_cfg, strided_cfg = _pack_cfgs()
    mc = dataclasses.replace(ModelConfig(), scenario_agg=agg_mode)
    config = Config(pack=contig_cfg, model=mc)
    scens = _scens()
    b_c, _ = pack_batch(scens, contig_cfg, mc)
    b_s, _ = pack_batch(scens, strided_cfg, mc)
    net = LaneGCN(mc)
    b_c = jax.tree.map(jnp.asarray, b_c)
    b_s = jax.tree.map(jnp.asarray, b_s)
    params = net.init(jax.random.PRNGKey(0), b_c)["params"]

    def run(batch):
        out = net.apply({"params": params}, batch)
        losses = pred_loss(out, batch, config.loss)
        m = agent_metrics(out, batch)
        return float(losses["loss"]), float(m["ade_sum"])

    loss_c, ade_c = run(b_c)
    loss_s, ade_s = run(b_s)
    np.testing.assert_allclose(loss_s, loss_c, rtol=1e-5)
    np.testing.assert_allclose(ade_s, ade_c, rtol=1e-5)


@pytest.mark.slow
def test_grad_matches_contiguous_layout():
    """Parameter gradients agree between layouts (plan VJP correctness in
    the full model)."""
    from lanegcn_tpu.models.lanegcn import LaneGCN, pred_loss

    contig_cfg, strided_cfg = _pack_cfgs()
    mc = dataclasses.replace(ModelConfig(), scenario_agg="interpret")
    config = Config(pack=contig_cfg, model=mc)
    scens = _scens()
    b_c, _ = pack_batch(scens, contig_cfg, mc)
    b_s, _ = pack_batch(scens, strided_cfg, mc)
    net = LaneGCN(mc)
    b_c = jax.tree.map(jnp.asarray, b_c)
    b_s = jax.tree.map(jnp.asarray, b_s)
    params = net.init(jax.random.PRNGKey(1), b_c)["params"]

    def loss_fn(p, batch):
        out = net.apply({"params": p}, batch)
        return pred_loss(out, batch, config.loss)["loss"]

    g_c = jax.grad(loss_fn)(params, b_c)
    g_s = jax.grad(loss_fn)(params, b_s)
    flat_c = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g_c)])
    flat_s = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g_s)])
    np.testing.assert_allclose(flat_s, flat_c, rtol=5e-4, atol=5e-5)


def test_lanercnn_loss_matches_contiguous_layout():
    """LaneRCNN: windowed RoI + global layouts with plans vs contiguous —
    identical loss (row layout is internal)."""
    from lanegcn_tpu.config import RoiPackConfig
    from lanegcn_tpu.data.dataset import RoiSyntheticDataset
    from lanegcn_tpu.data.packing_roi import pack_roi_batch
    from lanegcn_tpu.models.lanercnn import LaneRCNN, roi_loss, roi_metrics
    from lanegcn_tpu.config import LossConfig

    base = dict(
        max_scenarios=2, max_rois=8, max_interest_nodes=256,
        max_edges_scale0=512, max_edges_dilated=512, max_edges_lr=512,
        max_a2m_edges=256, max_pool_edges=8192, max_a2r_edges=512,
    )
    contig = RoiPackConfig(max_roi_nodes=1024, max_global_nodes=512, **base)
    windowed = RoiPackConfig(
        max_roi_nodes=256 * 6, max_global_nodes=256 * 4, node_stride=256,
        max_plan_edges=256, table_relations=(), **base,
    )
    mc = dataclasses.replace(ModelConfig(), scenario_agg="xla")
    ds = RoiSyntheticDataset(100, num_corridors=1, num_actors=4)
    scens = [ds[500 + i] for i in range(2)]
    b_c, st_c = pack_roi_batch(scens, contig, mc)
    b_w, st_w = pack_roi_batch(scens, windowed, mc)
    assert st_w["packed_scenarios"] == st_c["packed_scenarios"] == 2
    assert st_w.get("plan_edges", 0) > 0, st_w
    drops = {k: v for k, v in st_w.items()
             if k.startswith("dropped") and np.any(v)}
    assert not drops, drops
    net = LaneRCNN(mc)
    b_c = jax.tree.map(jnp.asarray, b_c)
    b_w = jax.tree.map(jnp.asarray, b_w)
    params = net.init(jax.random.PRNGKey(2), b_c)["params"]

    def run(batch):
        out = net.apply({"params": params}, batch)
        return float(roi_loss(out, batch, LossConfig())["loss"])

    np.testing.assert_allclose(run(b_w), run(b_c), rtol=1e-4)
