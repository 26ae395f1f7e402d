"""Drop accounting (VERDICT r3 #4): deliberately-skewed packs must FIRE the
dropped_*/skipped_*/spilled_* counters — and training must proceed on the
degraded pack rather than crash. The train CLI aggregates these counters
into its display line (cli.py train); bench.py publishes them in its JSON
("dropped"). The reference has no equivalent (it batches dynamically and
can never drop — data.py:555-561); static capacities make the accounting a
first-class correctness surface."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanegcn_tpu.config import Config, ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.data.synthetic import make_urban_scenario


def _tight_pack_cfg():
    # Edge capacities far below urban occupancy → every list truncates.
    return PackConfig(
        max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=128, max_edges_dilated=128, max_edges_lr=128,
        max_a2m_edges=128, max_m2a_edges=128, max_a2a_edges=128,
    )


def test_skewed_pack_fires_drop_counters_and_trains():
    scens = [make_urban_scenario(s, num_corridors=6, num_actors=12) for s in range(2)]
    cfg = Config(pack=_tight_pack_cfg())
    batch, stats = pack_batch(scens, cfg.pack, cfg.model)
    drops = {k: v for k, v in stats.items() if k.startswith("dropped") and v}
    assert drops, f"tight capacities must drop edges, stats={stats}"

    # Training proceeds on the degraded pack (finite loss, params update).
    from lanegcn_tpu.models.lanegcn import LaneGCN
    from lanegcn_tpu.train.loop import make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer

    batch = jax.tree.map(jnp.asarray, batch)
    net = LaneGCN(cfg.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    tx, lr_fn = make_optimizer(cfg.train)
    opt_state = tx.init(params)
    step = make_train_step(cfg, net, tx, lr_fn)
    params, opt_state, m = step(params, opt_state, batch, 0.0)
    assert np.isfinite(float(m["loss"]))


def test_plan_spill_counter_fires():
    # A 1-slot plan budget forces nearly all overflow edges to spill back to
    # the classic lists (counted in spilled_plan_edges) — and with tight
    # classic caps the spill then drops (counted in dropped_*).
    cfg = ModelConfig()
    pack = PackConfig(
        max_scenarios=2, max_actors=64, max_nodes=2 * 768, node_stride=768,
        max_plan_edges=128, table_relations=(),
        max_edges_scale0=128, max_edges_dilated=128, max_edges_lr=128,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=2048,
    )
    scens = [make_urban_scenario(s, num_corridors=6, num_actors=6) for s in range(2)]
    batch, stats = pack_batch(scens, pack, cfg)
    assert stats.get("spilled_plan_edges", 0) > 0, stats


def test_shard_partition_overflow_counter_fires():
    from lanegcn_tpu.parallel.graph_parallel import (
        partition_pack_edges,
        stack_pack_edges,
    )

    cfg = Config(pack=PackConfig(
        max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=1024, max_edges_dilated=2048, max_edges_lr=1024,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=1024,
    ))
    scens = [make_urban_scenario(s, num_corridors=4, num_actors=6) for s in range(2)]
    batch, stats = pack_batch(
        scens, cfg.pack, cfg.model, split_bands=False, split_tables=False,
        scenario_plan=False,
    )
    # slack ≈ 0 → per-shard capacity 128-aligned minimum; real shards overflow.
    se = partition_pack_edges(batch, cfg, num_shards=2, slack=0.01)
    assert se["dropped_edges"] > 0
    # stack_pack_edges surfaces the count (and logs); the partitioned edges
    # stay well-formed — masks consistent with capacities.
    stacked = stack_pack_edges([se])
    for rel in stacked["graph"].values():
        # leading axes [D=1, G=2, cap]; per-shard valid count ≤ capacity
        m = np.asarray(rel.mask)
        assert m.ndim == 3 and m.shape[:2] == (1, 2)


def test_window_chunked_pool_drop_warns():
    # packing_roi warns loudly when window chunk alignment drops pool edges
    # (ADVICE r3 medium: silent training-signal change).
    from lanegcn_tpu.data.packing import window_chunked_edges

    u = np.concatenate([np.full(700, w * 128) for w in range(4)])
    v = np.arange(len(u)) % 50
    es, dropped = window_chunked_edges(u, v, 1024, 128, 50)
    assert dropped > 0

    from lanegcn_tpu.config import RoiPackConfig
    from lanegcn_tpu.data.lane_roi import generate_lane_rois
    from lanegcn_tpu.data.packing_roi import pack_roi_batch

    scens = [
        generate_lane_rois(make_synthetic_scenario(s, num_corridors=3, num_actors=6))
        for s in range(2)
    ]
    roi_cfg = RoiPackConfig(
        max_scenarios=2, max_rois=32, max_roi_nodes=4096, node_stride=256,
        max_global_nodes=4096, global_node_stride=256,
        max_interest_nodes=512,
        max_edges_scale0=2048, max_edges_dilated=4096, max_edges_lr=2048,
        max_a2m_edges=2048, max_pool_edges=1024, max_a2r_edges=2048,
    )
    with pytest.warns(UserWarning, match="window-chunked"):
        batch, stats = pack_roi_batch(scens, roi_cfg, ModelConfig())
    assert stats.get("dropped_r2g", 0) + stats.get("dropped_g2r", 0) > 0

    # window_pool_edges=False keeps the flat destination-sorted layout — no
    # alignment padding, so the same capacity drops fewer (or zero) edges.
    import dataclasses

    flat_cfg = dataclasses.replace(roi_cfg, window_pool_edges=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning expected
        batch2, stats2 = pack_roi_batch(scens, flat_cfg, ModelConfig())
    assert batch2.r2g.win_lu is None
    assert (
        stats2.get("dropped_r2g", 0) + stats2.get("dropped_g2r", 0)
        <= stats.get("dropped_r2g", 0) + stats.get("dropped_g2r", 0)
    )
