"""Edge-partitioned LaneConv vs the unsharded LaneConvStack (exact params)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.map_net import LaneConvStack
from lanegcn_tpu.parallel.graph_shard import (
    make_sharded_lane_conv,
    partition_edges_by_source,
)
from lanegcn_tpu.parallel.sharding import make_mesh_2d


PACK = PackConfig(
    max_scenarios=2, max_actors=32, max_nodes=512,
    max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
    max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
)


@pytest.mark.parametrize("num_shards", [2, 4])
def test_sharded_lane_conv_matches_unsharded(num_shards):
    cfg = Config(pack=PACK)
    scens = [make_synthetic_scenario(seed=60 + i, num_corridors=1, num_actors=4) for i in range(2)]
    # The explicit edge-partition path consumes edge lists; keep every edge
    # in the lists (no neighbor-table splitting) for this comparison.
    batch, _ = pack_batch(scens, cfg.pack, cfg.model, split_tables=False)
    batch = jax.tree.map(jnp.asarray, batch)

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(cfg.pack.max_nodes, cfg.model.n_map)).astype(np.float32))

    stack = LaneConvStack(cfg.model, num_layers=4)
    params = stack.init(jax.random.PRNGKey(0), feat, batch.graph.edges)["params"]
    expect = stack.apply({"params": params}, feat, batch.graph.edges)

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:num_shards]), ("graph",))
    sharded_edges = partition_edges_by_source(
        batch.graph.edges, cfg.pack.max_nodes, num_shards
    )
    sharded_edges = jax.tree.map(jnp.asarray, sharded_edges)
    fn = make_sharded_lane_conv(cfg.model, mesh, cfg.pack.max_nodes, num_layers=4)
    got = fn(params, feat, sharded_edges)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_partition_edges_by_source_covers_all_edges():
    cfg = Config(pack=PACK)
    scens = [make_synthetic_scenario(seed=70, num_corridors=1, num_actors=4)]
    batch, _ = pack_batch(scens, cfg.pack, cfg.model, split_tables=False)
    sharded = partition_edges_by_source(batch.graph.edges, cfg.pack.max_nodes, 4)
    rows = cfg.pack.max_nodes // 4
    for nm, e in batch.graph.edges.items():
        m = np.asarray(e.mask)
        orig = set(zip(np.asarray(e.u)[m].tolist(), np.asarray(e.v)[m].tolist()))
        got = set()
        se = sharded[nm]
        for s in range(4):
            sm = np.asarray(se.mask[s])
            got |= set(
                zip(
                    np.asarray(se.u[s])[sm].tolist(),
                    (np.asarray(se.v[s])[sm] + s * rows).tolist(),
                )
            )
        assert got == orig, nm


def test_sharded_att_matches_unsharded():
    """Graph-sharded Att (edge partition + psum_scatter) == models.fusion.Att."""
    from jax.sharding import Mesh

    from lanegcn_tpu.graph import EdgeSet
    from lanegcn_tpu.models.fusion import Att
    from lanegcn_tpu.parallel.graph_shard import (
        make_sharded_att,
        partition_edge_set_by_source,
    )

    rng = np.random.default_rng(1)
    a, cn, e_cap, e_val = 64, 128, 256, 200
    agts = jnp.asarray(rng.normal(size=(a, 128)).astype(np.float32))
    agt_ctrs = jnp.asarray(rng.uniform(-10, 10, (a, 2)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(cn, 128)).astype(np.float32))
    ctx_ctrs = jnp.asarray(rng.uniform(-10, 10, (cn, 2)).astype(np.float32))
    u = rng.integers(0, a, e_cap).astype(np.int32)
    v = rng.integers(0, cn, e_cap).astype(np.int32)
    mask = np.zeros(e_cap, bool)
    mask[:e_val] = True
    edges = EdgeSet(u=jnp.asarray(u), v=jnp.asarray(v), mask=jnp.asarray(mask))

    att = Att(128, 128)
    params = att.init(jax.random.PRNGKey(0), agts, agt_ctrs, ctx, ctx_ctrs, edges)["params"]
    expect = att.apply({"params": params}, agts, agt_ctrs, ctx, ctx_ctrs, edges)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    sharded_edges = jax.tree.map(
        jnp.asarray, partition_edge_set_by_source(edges, cn, 4)
    )
    fn = make_sharded_att(mesh, a)
    got = fn(params, agts, agt_ctrs, ctx, ctx_ctrs, sharded_edges)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)
