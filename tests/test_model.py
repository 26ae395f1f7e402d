"""LaneGCN forward/loss smoke + invariance tests on synthetic packed batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss


SMALL_PACK = PackConfig(
    max_scenarios=2,
    max_actors=48,
    max_nodes=1024,
    max_edges_scale0=1536,
    max_edges_dilated=2048,
    max_edges_lr=512,
    max_a2m_edges=2048,
    max_m2a_edges=2048,
    max_a2a_edges=1024,
)


@pytest.fixture(scope="module")
def cfg():
    return Config(pack=SMALL_PACK)


@pytest.fixture(scope="module")
def batch(cfg):
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=8) for i in range(2)]
    b, stats = pack_batch(scens, cfg.pack, cfg.model)
    assert stats["packed_scenarios"] == 2
    assert stats["skipped_scenarios"] == 0
    return jax.tree.map(jnp.asarray, b)


@pytest.fixture(scope="module")
def params_and_out(cfg, batch):
    net = LaneGCN(cfg.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    out = jax.jit(lambda p, b: net.apply({"params": p}, b))(params, batch)
    return net, params, out


def test_forward_shapes(cfg, batch, params_and_out):
    _, _, out = params_and_out
    a = cfg.pack.max_actors
    assert out["cls"].shape == (a, cfg.model.num_mods)
    assert out["reg"].shape == (a, cfg.model.num_mods, cfg.model.num_preds, 2)
    assert np.isfinite(np.asarray(out["cls"])).all()
    assert np.isfinite(np.asarray(out["reg"])).all()


def test_cls_sorted_descending(params_and_out):
    _, _, out = params_and_out
    cls = np.asarray(out["cls"])
    assert (np.diff(cls, axis=1) <= 1e-6).all(), "modes must be confidence-descending"


def test_loss_finite_and_positive(cfg, batch, params_and_out):
    _, _, out = params_and_out
    losses = pred_loss(out, batch, cfg.loss)
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["num_reg"]) > 0
    assert float(losses["loss"]) > 0


def test_metrics_reasonable(cfg, batch, params_and_out):
    _, _, out = params_and_out
    m = agent_metrics(out, batch)
    assert float(m["num_scen"]) == 2
    assert float(m["ade_sum"]) >= 0
    assert float(m["fde_sum"]) >= float(m["ade_sum"]) * 0  # finite


def test_padding_invariance(cfg, batch, params_and_out):
    """Growing actor capacity (more padding rows) must not change real outputs."""
    net, params, out = params_and_out
    bigger = PackConfig(**{**SMALL_PACK.__dict__, "max_actors": 64})
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=8) for i in range(2)]
    b2, _ = pack_batch(scens, bigger, cfg.model)
    b2 = jax.tree.map(jnp.asarray, b2)
    out2 = net.apply({"params": params}, b2)
    na = int(np.asarray(batch.actors.mask).sum())
    np.testing.assert_allclose(
        np.asarray(out["reg"])[:na], np.asarray(out2["reg"])[:na], rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_gradients_flow(cfg, batch, params_and_out):
    net, params, _ = params_and_out

    def loss_fn(p):
        out = net.apply({"params": p}, batch)
        return pred_loss(out, batch, cfg.loss)["loss"]

    grads = jax.grad(loss_fn)(params)
    norms = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    leaves = jax.tree.leaves(norms)
    assert all(np.isfinite(l) for l in leaves)
    # The overwhelming majority of parameters must receive gradient.
    nonzero = sum(1 for l in leaves if l > 0)
    assert nonzero / len(leaves) > 0.9, f"only {nonzero}/{len(leaves)} grads nonzero"


def test_band_split_equivalence(cfg, params_and_out):
    """split_bands=True (masked-roll path) must equal split_bands=False
    (pure edge-list path) on identical scenarios, and must actually move a
    majority of pre/suc edges into bands."""
    net, params, _ = params_and_out
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=8) for i in range(2)]
    b_band, s_band = pack_batch(scens, cfg.pack, cfg.model, split_bands=True)
    b_list, s_list = pack_batch(scens, cfg.pack, cfg.model, split_bands=False)
    assert b_band.graph.bands is not None and b_list.graph.bands is None

    total_banded = sum(v for k, v in s_band.items() if k.startswith("banded_"))
    total_edges = total_banded + sum(
        int(np.asarray(b_band.graph.edges[nm].mask).sum())
        for nm in b_band.graph.edges
        if nm.startswith(("pre", "suc"))
    )
    assert total_banded > 0.5 * total_edges, (total_banded, total_edges)

    # Band mask ∪ residual edge list must reconstruct the unsplit edge set.
    from lanegcn_tpu.config import band_shift, relation_names

    for nm in relation_names(cfg.model.num_scales):
        e_full = b_list.graph.edges[nm]
        m = np.asarray(e_full.mask)
        full = set(zip(np.asarray(e_full.u)[m].tolist(), np.asarray(e_full.v)[m].tolist()))
        e_res = b_band.graph.edges[nm]
        m = np.asarray(e_res.mask)
        got = set(zip(np.asarray(e_res.u)[m].tolist(), np.asarray(e_res.v)[m].tolist()))
        shift = band_shift(nm)
        if shift is not None:
            for u in np.nonzero(np.asarray(b_band.graph.bands[nm]))[0].tolist():
                got.add((u, u + shift))
        assert got == full, nm

    b_band = jax.tree.map(jnp.asarray, b_band)
    b_list = jax.tree.map(jnp.asarray, b_list)
    out_band = net.apply({"params": params}, b_band)
    out_list = net.apply({"params": params}, b_list)
    np.testing.assert_allclose(
        np.asarray(out_band["reg"]), np.asarray(out_list["reg"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_band["cls"]), np.asarray(out_list["cls"]), rtol=2e-4, atol=2e-4
    )


def test_table_split_equivalence(cfg, params_and_out):
    """split_tables=True (neighbor-table gather path) must equal
    split_tables=False (pure edge-list path), absorb ALL left/right edges
    (functional nearest-neighbor matching ⇒ one source per destination), and
    table ∪ residual list must reconstruct the unsplit edge set."""
    net, params, _ = params_and_out
    scens = [make_synthetic_scenario(seed=40 + i, num_corridors=2, num_actors=8) for i in range(2)]
    b_tbl, s_tbl = pack_batch(scens, cfg.pack, cfg.model, split_tables=True)
    b_list, s_list = pack_batch(scens, cfg.pack, cfg.model, split_tables=False)
    assert b_tbl.graph.tables is not None and b_list.graph.tables is None

    n_cap = cfg.pack.max_nodes
    for nm in ("left", "right"):
        # left/right must live entirely in the table.
        assert int(np.asarray(b_tbl.graph.edges[nm].mask).sum()) == 0, nm
        tabled = s_tbl[f"tabled_{nm}"]
        e_full = b_list.graph.edges[nm]
        assert tabled == int(np.asarray(e_full.mask).sum()) > 0, nm

    from lanegcn_tpu.config import relation_names

    for nm in relation_names(cfg.model.num_scales):
        e_full = b_list.graph.edges[nm]
        m = np.asarray(e_full.mask)
        full = set(zip(np.asarray(e_full.u)[m].tolist(), np.asarray(e_full.v)[m].tolist()))
        e_res = b_tbl.graph.edges[nm]
        m = np.asarray(e_res.mask)
        got = set(zip(np.asarray(e_res.u)[m].tolist(), np.asarray(e_res.v)[m].tolist()))
        if nm in b_tbl.graph.tables:
            tbl = np.asarray(b_tbl.graph.tables[nm])
            for u in np.nonzero(tbl < n_cap)[0].tolist():
                got.add((u, int(tbl[u])))
        assert got == full, nm

    b_tbl = jax.tree.map(jnp.asarray, b_tbl)
    b_list = jax.tree.map(jnp.asarray, b_list)
    out_tbl = net.apply({"params": params}, b_tbl)
    out_list = net.apply({"params": params}, b_list)
    np.testing.assert_allclose(
        np.asarray(out_tbl["reg"]), np.asarray(out_list["reg"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_tbl["cls"]), np.asarray(out_list["cls"]), rtol=2e-4, atol=2e-4
    )


def test_table_gather_grad_parity(cfg, params_and_out):
    """The neighbor-table path uses a hand-written VJP (ops.table_gather:
    inverse-edge-list transpose). Its end-to-end gradients must match the
    pure edge-list path's autodiff gradients."""
    net, params, _ = params_and_out
    scens = [make_synthetic_scenario(seed=50 + i, num_corridors=2, num_actors=8) for i in range(2)]
    b_tbl, _ = pack_batch(scens, cfg.pack, cfg.model, split_tables=True)
    b_list, _ = pack_batch(
        scens, cfg.pack, cfg.model, split_bands=False, split_tables=False
    )
    b_tbl = jax.tree.map(jnp.asarray, b_tbl)
    b_list = jax.tree.map(jnp.asarray, b_list)

    def loss(p, b):
        out = net.apply({"params": p}, b)
        return jnp.sum(out["reg"] ** 2) / 1e3 + jnp.sum(out["cls"] ** 2)

    from jax.flatten_util import ravel_pytree

    g_tbl = jax.grad(loss)(params, b_tbl)
    g_list = jax.grad(loss)(params, b_list)
    flat_t, _ = ravel_pytree(g_tbl)
    flat_l, _ = ravel_pytree(g_list)
    scale = float(jnp.max(jnp.abs(flat_l))) or 1.0
    np.testing.assert_allclose(
        np.asarray(flat_t) / scale, np.asarray(flat_l) / scale, rtol=1e-4, atol=1e-4
    )


def test_split_linear_width_mismatch_raises():
    """SplitLinear raises a clear error when a part's feature dim disagrees
    with its declared width (ADVICE round 1)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from lanegcn_tpu.models.layers import SplitLinear

    m = SplitLinear(8, widths=(4, 4))
    parts_bad = [(jnp.ones((3, 4)), None), (jnp.ones((3, 5)), None)]
    with pytest.raises(AssertionError, match="declared width"):
        m.init(jax.random.PRNGKey(0), parts_bad)
