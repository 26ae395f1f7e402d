"""Pallas kernel correctness (interpret mode on CPU) vs scatter_add."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.ops import scatter_add
from lanegcn_tpu.ops.pallas_scatter import sort_edges_by_destination, sorted_segment_sum


@pytest.mark.parametrize("n,e,c", [(256, 1000, 128), (130, 77, 8)])
def test_sorted_segment_sum_matches_scatter(n, e, c):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(e, c)).astype(np.float32)
    seg = np.sort(rng.integers(0, n, size=e)).astype(np.int32)

    got = sorted_segment_sum(
        jnp.array(data), jnp.array(seg), n, block_rows=128, interpret=True
    )
    expect = scatter_add(jnp.array(data), jnp.array(seg), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_sorted_segment_sum_drops_out_of_range():
    data = jnp.ones((4, 8))
    seg = jnp.array([0, 1, 5, 5], jnp.int32)  # 5 >= num_segments → dropped
    out = sorted_segment_sum(data, seg, 4, block_rows=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[0], 1.0)
    np.testing.assert_allclose(np.asarray(out)[2:], 0.0)


def test_sorted_segment_sum_bounded_window():
    """A tight max_edges_per_block still sums correctly when it covers the
    densest block."""
    rng = np.random.default_rng(1)
    n, c = 256, 16
    # ≤ 3 edges per destination → window of 3*128 covers any 128-row block.
    seg = np.sort(np.repeat(np.arange(n), 3)[: n * 3]).astype(np.int32)
    data = rng.normal(size=(len(seg), c)).astype(np.float32)
    got = sorted_segment_sum(
        jnp.array(data), jnp.array(seg), n, block_rows=128,
        max_edges_per_block=3 * 128, interpret=True,
    )
    expect = scatter_add(jnp.array(data), jnp.array(seg), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-5)


def test_sort_edges_by_destination_helper():
    u = jnp.array([5, 1, 3, 2], jnp.int32)
    v = jnp.array([10, 11, 12, 13], jnp.int32)
    mask = jnp.array([True, True, False, True])
    su, sv, sm, order = sort_edges_by_destination(u, v, mask, 8)
    assert su.tolist() == [1, 2, 5, 8]  # masked edge routed to seg 8 at the end
    assert sv.tolist() == [11, 13, 10, 12]
    assert sm.tolist() == [True, True, True, False]


def test_scatter_add_sorted_autodiff():
    """Custom-VJP wrapper: forward matches scatter_add, gradient is the
    masked gather of the cotangent, out= accumulates."""
    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.ops import scatter_add
    from lanegcn_tpu.ops.pallas_scatter import scatter_add_sorted

    rng = np.random.RandomState(3)
    n, e, c = 96, 300, 16
    seg = np.sort(rng.randint(0, n, e)).astype(np.int32)
    mask = np.ones(e, bool)
    mask[-32:] = False
    seg_m = np.where(mask, seg, n).astype(np.int32)  # padding routed to end
    data = jnp.asarray(rng.randn(e, c).astype(np.float32))
    w = jnp.asarray(rng.randn(n, c).astype(np.float32))

    def f_sorted(d):
        return jnp.sum(scatter_add_sorted(d, jnp.asarray(seg_m), n, interpret=True) * w)

    def f_xla(d):
        return jnp.sum(scatter_add(d, jnp.asarray(seg), n, mask=jnp.asarray(mask)) * w)

    np.testing.assert_allclose(f_sorted(data), f_xla(data), rtol=1e-5)
    g_s = jax.grad(f_sorted)(data)
    g_x = jax.grad(f_xla)(data)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_x), rtol=1e-5, atol=1e-6)
    # masked edges get zero gradient
    assert (np.asarray(g_s)[~mask] == 0).all()

    out0 = jnp.asarray(rng.randn(n, c).astype(np.float32))
    a = scatter_add_sorted(data, jnp.asarray(seg_m), n, out=out0, interpret=True)
    b = scatter_add(data, jnp.asarray(seg), n, mask=jnp.asarray(mask), out=out0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def _band_ref(feat, masks, w, shifts):
    out = jnp.zeros_like(feat, dtype=jnp.float32)
    n = feat.shape[0]
    for j, s in enumerate(shifts):
        src = jnp.where(masks[j][:, None] > 0, jnp.roll(feat, -s, 0), 0)
        out = out + (src @ w[j]).astype(jnp.float32)
    return out.astype(feat.dtype)


@pytest.mark.parametrize("n,c", [(512, 128), (1024, 128)])
def test_band_conv_matches_einsum(n, c):
    from lanegcn_tpu.ops.pallas_band_conv import band_conv

    shifts = (-1, -2, -4, -8, -16, -32, 1, 2, 4, 8, 16, 32)
    j = len(shifts)
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    m = rng.random((j, n)) < 0.6
    # the kernel zero-pads past the array ends while jnp.roll wraps; real
    # band masks never mark a wrapped row (edges stay within a lane), so
    # clear the wrap region for the comparison
    for k, s in enumerate(shifts):
        if s > 0:
            m[k, n - s :] = False
        else:
            m[k, : -s] = False
    masks = jnp.asarray(m.astype(np.float32))
    w = jnp.asarray(rng.normal(size=(j, c, c)).astype(np.float32) * 0.1)

    got = band_conv(feat, masks, w, shifts, True)
    expect = _band_ref(feat, masks, w, shifts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-4)

    def loss_k(f, ww):
        return jnp.sum(band_conv(f, masks, ww, shifts, True) ** 2)

    def loss_r(f, ww):
        return jnp.sum(_band_ref(f, masks, ww, shifts) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(feat, w)
    gr = jax.grad(loss_r, argnums=(0, 1))(feat, w)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-3)


def test_lane_conv_stack_pallas_interpret_parity():
    """LaneConvStack with pallas_bands='interpret' must match the einsum
    path end-to-end on a real packed graph."""
    import dataclasses

    from lanegcn_tpu.config import Config, ModelConfig, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.map_net import LaneConvStack

    pc = PackConfig(
        max_scenarios=2, max_actors=32, max_nodes=512,
        max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
        max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
    )
    cfg = Config(pack=pc)
    scens = [make_synthetic_scenario(seed=80 + i, num_corridors=2, num_actors=4) for i in range(2)]
    batch, _ = pack_batch(scens, pc, cfg.model)
    batch = jax.tree.map(jnp.asarray, batch)
    g = batch.graph
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(pc.max_nodes, cfg.model.n_map)).astype(np.float32))

    stack_x = LaneConvStack(cfg.model, num_layers=2)
    params = stack_x.init(jax.random.PRNGKey(0), feat, g.edges, g.bands, g.tables, g.table_inv)["params"]
    expect = stack_x.apply({"params": params}, feat, g.edges, g.bands, g.tables, g.table_inv)

    mcfg_p = dataclasses.replace(cfg.model, pallas_bands="interpret")
    stack_p = LaneConvStack(mcfg_p, num_layers=2)
    got = stack_p.apply({"params": params}, feat, g.edges, g.bands, g.tables, g.table_inv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_lane_conv_stack_pallas_grad_parity():
    """Gradients through the fused Pallas layer (hand-written GN backward,
    band transpose conv, dW accumulation) must match the unfused autodiff."""
    import dataclasses

    from jax.flatten_util import ravel_pytree

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.map_net import LaneConvStack

    pc = PackConfig(
        max_scenarios=2, max_actors=32, max_nodes=512,
        max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
        max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
    )
    cfg = Config(pack=pc)
    scens = [make_synthetic_scenario(seed=90 + i, num_corridors=2, num_actors=4) for i in range(2)]
    batch, _ = pack_batch(scens, pc, cfg.model)
    batch = jax.tree.map(jnp.asarray, batch)
    g = batch.graph
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(pc.max_nodes, cfg.model.n_map)).astype(np.float32))

    stack_x = LaneConvStack(cfg.model, num_layers=2)
    params = stack_x.init(jax.random.PRNGKey(0), feat, g.edges, g.bands, g.tables, g.table_inv)["params"]
    mcfg_p = dataclasses.replace(cfg.model, pallas_bands="interpret")
    stack_p = LaneConvStack(mcfg_p, num_layers=2)

    def loss(stack, p, f):
        out = stack.apply({"params": p}, f, g.edges, g.bands, g.tables, g.table_inv)
        return jnp.sum(out ** 2) / out.size

    gx_p, gx_f = jax.grad(lambda p, f: loss(stack_x, p, f), argnums=(0, 1))(params, feat)
    gp_p, gp_f = jax.grad(lambda p, f: loss(stack_p, p, f), argnums=(0, 1))(params, feat)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gx_f), rtol=1e-3, atol=1e-5)
    fx, _ = ravel_pytree(gx_p)
    fp, _ = ravel_pytree(gp_p)
    scale = float(jnp.max(jnp.abs(fx))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fp) / scale, np.asarray(fx) / scale, rtol=1e-3, atol=1e-4
    )


def test_att_pallas_edge_parity():
    """Fused edge-MLP kernel (ops/pallas_edge_mlp) must match the unfused
    Att forward bit-for-bit up to fp tolerance, with the SAME param tree
    (checkpoint compatibility between backends)."""
    import dataclasses

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.fusion import Att

    pc = PackConfig(
        max_scenarios=2, max_actors=32, max_nodes=512,
        max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
        max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
    )
    cfg = Config(pack=pc)
    scens = [make_synthetic_scenario(seed=70 + i, num_corridors=2, num_actors=4) for i in range(2)]
    batch, _ = pack_batch(scens, pc, cfg.model)
    batch = jax.tree.map(jnp.asarray, batch)
    rng = np.random.default_rng(5)
    nodes = jnp.asarray(rng.normal(size=(pc.max_nodes, 128)).astype(np.float32))
    actors = jnp.asarray(rng.normal(size=(pc.max_actors, 128)).astype(np.float32))
    args = (nodes, batch.graph.ctrs, actors, batch.actors.ctrs, batch.fusion.a2m)

    att_x = Att(128, 128, pallas_edge="off")
    params = att_x.init(jax.random.PRNGKey(0), *args)["params"]
    att_p = Att(128, 128, pallas_edge="interpret")
    params_p = att_p.init(jax.random.PRNGKey(0), *args)["params"]

    # identical param trees (names, shapes, and init values)
    fx = jax.tree.leaves(params)
    fp = jax.tree.leaves(params_p)
    assert jax.tree.structure(params) == jax.tree.structure(params_p)
    for a, b in zip(fx, fp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    expect = att_x.apply({"params": params}, *args)
    got = att_p.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_att_pallas_edge_grad_parity():
    """Hand-written VJP of the fused edge MLP vs unfused autodiff."""
    from jax.flatten_util import ravel_pytree

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.fusion import Att

    pc = PackConfig(
        max_scenarios=2, max_actors=32, max_nodes=512,
        max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
        max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
    )
    cfg = Config(pack=pc)
    scens = [make_synthetic_scenario(seed=75 + i, num_corridors=2, num_actors=4) for i in range(2)]
    batch, _ = pack_batch(scens, pc, cfg.model)
    batch = jax.tree.map(jnp.asarray, batch)
    rng = np.random.default_rng(6)
    nodes = jnp.asarray(rng.normal(size=(pc.max_nodes, 128)).astype(np.float32))
    actors = jnp.asarray(rng.normal(size=(pc.max_actors, 128)).astype(np.float32))
    args = (batch.graph.ctrs, actors, batch.actors.ctrs, batch.fusion.a2m)

    att_x = Att(128, 128, pallas_edge="off")
    att_p = Att(128, 128, pallas_edge="interpret")
    params = att_x.init(jax.random.PRNGKey(0), nodes, *args)["params"]

    def loss(att, p, f):
        out = att.apply({"params": p}, f, *args)
        return jnp.sum(out ** 2) / out.size

    gx_p, gx_f = jax.grad(lambda p, f: loss(att_x, p, f), argnums=(0, 1))(params, nodes)
    gp_p, gp_f = jax.grad(lambda p, f: loss(att_p, p, f), argnums=(0, 1))(params, nodes)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gx_f), rtol=1e-3, atol=1e-5)
    fx, _ = ravel_pytree(gx_p)
    fp, _ = ravel_pytree(gp_p)
    scale = float(jnp.max(jnp.abs(fx))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fp) / scale, np.asarray(fx) / scale, rtol=1e-3, atol=1e-4
    )


def test_lane_pooling_pallas_edge_parity():
    """Fused LanePooling edge chain (has_dist2=False, has_query=False) vs
    the unfused path: same outputs and gradients."""
    from jax.flatten_util import ravel_pytree

    from lanegcn_tpu.graph import EdgeSet
    from lanegcn_tpu.models.lanercnn import LanePooling

    rng = np.random.default_rng(9)
    nc, nt, e_cap, n = 96, 64, 256, 128
    ctx_feat = jnp.asarray(rng.normal(size=(nc, n)).astype(np.float32))
    ctx_pose = jnp.asarray(rng.normal(size=(nc, 4)).astype(np.float32))
    tgt_feat = jnp.asarray(rng.normal(size=(nt, n)).astype(np.float32))
    tgt_pose = jnp.asarray(rng.normal(size=(nt, 4)).astype(np.float32))
    ne = 180
    u = np.sort(rng.integers(0, nt, ne)).astype(np.int32)
    v = rng.integers(0, nc, ne).astype(np.int32)
    mask = np.zeros(e_cap, bool); mask[:ne] = True
    uu = np.zeros(e_cap, np.int32); uu[:ne] = u
    vv = np.zeros(e_cap, np.int32); vv[:ne] = v
    edges = EdgeSet(u=jnp.asarray(uu), v=jnp.asarray(vv), mask=jnp.asarray(mask))
    args = (ctx_feat, ctx_pose, tgt_feat, tgt_pose, edges)

    pool_x = LanePooling(n, pallas_edge="off")
    pool_p = LanePooling(n, pallas_edge="interpret")
    params = pool_x.init(jax.random.PRNGKey(1), *args)["params"]
    params_p = pool_p.init(jax.random.PRNGKey(1), *args)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_p)

    expect = pool_x.apply({"params": params}, *args)
    got = pool_p.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)

    def loss(pool, p):
        out = pool.apply({"params": p}, *args)
        return jnp.sum(out ** 2) / out.size

    gx = jax.grad(lambda p: loss(pool_x, p))(params)
    gp = jax.grad(lambda p: loss(pool_p, p))(params)
    fx, _ = ravel_pytree(gx)
    fp, _ = ravel_pytree(gp)
    scale = float(jnp.max(jnp.abs(fx))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fp) / scale, np.asarray(fx) / scale, rtol=1e-3, atol=1e-4
    )


def test_plan_merged_layer_matches_separate_kernels():
    """fused_lane_layer_plan (plan applied inside the layer kernel) must
    match the separate scenario_agg + fused_lane_layer composition through
    the full model: same loss and parameter gradients on a real windowed
    pack (merge gate: stride >= 512, plan cap a chunk multiple)."""
    import dataclasses

    from lanegcn_tpu.config import Config, ModelConfig, PackConfig
    from lanegcn_tpu.data import pack_batch
    from lanegcn_tpu.data.synthetic import make_urban_scenario
    from lanegcn_tpu.models.lanegcn import LaneGCN, pred_loss
    from lanegcn_tpu.ops.pallas_scenario_agg import GROUPED_MIN_CAP

    cfg_pack = PackConfig(
        max_scenarios=4, max_actors=48,
        max_nodes=6 * 768, node_stride=768,
        max_plan_edges=GROUPED_MIN_CAP, table_relations=(),
        max_edges_scale0=512, max_edges_dilated=768, max_edges_lr=128,
        max_a2m_edges=768, max_m2a_edges=768, max_a2a_edges=256,
    )
    scens = [
        make_urban_scenario(seed=700 + i, num_corridors=3, num_actors=6)
        for i in range(4)
    ]
    mc = dataclasses.replace(
        ModelConfig(), pallas_bands="interpret", scenario_agg="interpret"
    )
    config = Config(pack=cfg_pack, model=mc)
    b, st = pack_batch(scens, cfg_pack, mc)
    assert st.get("plan_edges", 0) > 0, st
    b = jax.tree.map(jnp.asarray, b)

    def loss_and_grads(merge):
        m2 = dataclasses.replace(mc, merge_plan_agg=merge)
        net = LaneGCN(m2)
        params = net.init(jax.random.PRNGKey(3), b)["params"]

        def f(p):
            out = net.apply({"params": p}, b)
            return pred_loss(out, b, config.loss)["loss"]

        loss, grads = jax.value_and_grad(f)(params)
        return float(loss), np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(grads)]
        )

    l_merge, g_merge = loss_and_grads("auto")
    l_sep, g_sep = loss_and_grads("off")
    np.testing.assert_allclose(l_merge, l_sep, rtol=1e-5)
    np.testing.assert_allclose(g_merge, g_sep, rtol=5e-4, atol=5e-5)
