"""Degenerate-input robustness: scenarios with empty lane graphs or a lone
agent must pack, run, and train with finite outputs.

The reference crashes on this class of input: its MapNet empty-graph guard
references a nonexistent key (reference lanegcn.py:312-322, latent bug).
Here masked static shapes make the empty case just another mask pattern —
these tests pin that."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.data.featurize import featurize_scenario
from lanegcn_tpu.data.lane_graph import build_lane_graph
from lanegcn_tpu.models.lanegcn import LaneGCN, pred_loss
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer

CFG = Config(
    model=ModelConfig(n_actor=32, n_map=32, num_scales=3, num_fuse_layers=2),
    pack=PackConfig(
        max_scenarios=3, max_actors=48, max_nodes=2048,
        max_edges_scale0=3072, max_edges_dilated=4096, max_edges_lr=1024,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=1536,
    ),
)


def _lone_agent_scenario(seed: int):
    """One agent, zero context actors, zero lanes (off-map)."""
    rng = np.random.default_rng(seed)
    traj = np.cumsum(rng.normal(0, 1, (50, 2)), 0).astype(np.float64)
    scen = featurize_scenario([traj], [np.arange(50)])
    scen["graph"] = build_lane_graph([], num_scales=CFG.model.num_scales)
    return scen


def _run_pack(scens):
    b, stats = pack_batch(scens, CFG.pack, CFG.model)
    assert stats["packed_scenarios"] == len(scens), stats
    batch = jax.tree.map(jnp.asarray, b)
    net = LaneGCN(CFG.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    out = net.apply({"params": params}, batch)
    assert np.isfinite(np.asarray(out["reg"], np.float32)).all()
    losses = pred_loss(out, batch, CFG.loss)
    assert np.isfinite(float(losses["loss"])), losses
    tx, lr_fn = make_optimizer(CFG.train)
    step = make_train_step(CFG, net, tx, lr_fn)
    params, _, m = step(params, tx.init(params), batch, 0.0)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


@pytest.mark.slow
def test_empty_graph_scenario_mixed_pack():
    """An off-map (zero-lane) scenario packed next to a normal one."""
    _run_pack([
        _lone_agent_scenario(0),
        make_synthetic_scenario(
            seed=1, num_corridors=2, num_actors=5,
            num_scales=CFG.model.num_scales,
        ),
    ])


def test_all_empty_pack():
    """Every scenario in the pack has zero lane nodes and one actor —
    the whole map side of the batch is padding."""
    _run_pack([_lone_agent_scenario(s) for s in range(2)])


def test_lanercnn_skips_zero_roi_scenario():
    """A scenario with no lanes yields zero RoIs; the RoI packer must skip
    it (counted in stats) rather than crash, and the rest of the pack must
    train normally. (The reference's Decode requires an interest RoI and
    would fail on such input.)"""
    from lanegcn_tpu.config import RoiPackConfig
    from lanegcn_tpu.data.lane_roi import generate_lane_rois
    from lanegcn_tpu.data.packing_roi import pack_roi_batch
    from lanegcn_tpu.models.lanercnn import LaneRCNN, roi_loss
    import dataclasses

    cfg = dataclasses.replace(CFG, roi_pack=RoiPackConfig(
        max_scenarios=2, max_rois=32, max_roi_nodes=4096,
        max_interest_nodes=1024, max_edges_scale0=4096,
        max_edges_dilated=6144, max_edges_lr=4096, max_a2m_edges=2048,
        max_pool_edges=32768, max_a2r_edges=2048,
    ))
    empty = generate_lane_rois(
        _lone_agent_scenario(0), num_scales=cfg.model.num_scales
    )
    assert len(empty["subgraphs"]) == 0
    normal = generate_lane_rois(
        make_synthetic_scenario(
            seed=1, num_corridors=2, num_actors=4,
            num_scales=cfg.model.num_scales,
        ),
        num_scales=cfg.model.num_scales,
    )
    b, stats = pack_roi_batch([empty, normal], cfg.roi_pack, cfg.model)
    assert stats["skipped_scenarios"] == 1 and stats["packed_scenarios"] == 1
    batch = jax.tree.map(jnp.asarray, b)
    net = LaneRCNN(cfg.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    out = net.apply({"params": params}, batch)
    losses = roi_loss(out, batch, cfg.loss)
    assert np.isfinite(float(losses["loss"]))
