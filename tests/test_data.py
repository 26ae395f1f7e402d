"""Data pipeline tests: featurization, lane-graph construction, packing."""

import numpy as np
import pytest

from lanegcn_tpu.config import ModelConfig, PackConfig, relation_names
from lanegcn_tpu.data import build_lane_graph, featurize_scenario, make_synthetic_scenario, pack_batch
from lanegcn_tpu.data.lane_graph import Lane, dilated_nbrs


def test_featurize_agent_frame():
    # Straight-line agent moving +x in world; heading must map to π.
    t = np.arange(50)
    traj = np.stack([t * 1.0, np.zeros(50)], axis=1)
    data = featurize_scenario([traj], [t])
    np.testing.assert_allclose(data["orig"], [19.0, 0.0], atol=1e-6)
    # Rotated history: previous point must land at angle π (negative x side).
    assert data["ctrs"][0, 0] == pytest.approx(0.0, abs=1e-5)
    # Displacement per step in agent frame: moving along -x... the rotation
    # maps the *incoming* direction to π, so forward motion goes to +x... the
    # reference convention puts the last-step displacement at feat[19].
    feat = data["feats"][0]
    assert feat[19, 2] == 1.0
    assert abs(feat[19, 0]) == pytest.approx(1.0, abs=1e-5)
    # Future gt is world-frame raw.
    np.testing.assert_allclose(data["gt_preds"][0][0], [20.0, 0.0], atol=1e-6)
    assert data["has_preds"][0].all()


def test_featurize_drops_absent_actor():
    t = np.arange(50)
    traj = np.stack([t * 1.0, np.zeros(50)], axis=1)
    # Context actor not observed at step 19 → dropped.
    data = featurize_scenario([traj, traj[:10]], [t, t[:10]])
    assert len(data["feats"]) == 1


def test_featurize_partial_history_contiguous():
    t = np.arange(50)
    traj = np.stack([t * 1.0, np.zeros(50)], axis=1)
    # Context actor observed at steps 5..19 with a gap at 10: only 11..19 kept.
    keep = np.array([5, 6, 7, 8, 9, 11, 12, 13, 14, 15, 16, 17, 18, 19])
    data = featurize_scenario([traj, traj[keep]], [t, keep])
    feat = data["feats"][1]
    mask = feat[:, 2]
    assert mask[11:20].all() and not mask[:11].any()


def _two_lane_graph():
    # Two lanes: lane 1 follows lane 0 (successor chain), 4 segments each.
    cl0 = np.stack([np.arange(5.0), np.zeros(5)], axis=1)
    cl1 = np.stack([np.arange(4.0, 9.0), np.zeros(5)], axis=1)
    lanes = [
        Lane(0, cl0, successors=[1]),
        Lane(1, cl1, predecessors=[0]),
    ]
    return build_lane_graph(lanes, num_scales=3)


def test_lane_graph_nodes_and_chain_edges():
    g = _two_lane_graph()
    assert g["num_nodes"] == 8
    np.testing.assert_allclose(g["ctrs"][0], [0.5, 0.0])
    np.testing.assert_allclose(g["feats"][0], [1.0, 0.0])
    # suc scale 0: intra-lane 3+3 plus cross-lane link lane0→lane1.
    suc0 = g["suc"][0]
    assert len(suc0["u"]) == 7
    assert (4 - 1, 4) in set(zip(suc0["u"].tolist(), suc0["v"].tolist()))


def test_dilated_scales_exact_hops():
    g = _two_lane_graph()
    # Chain 0→1→...→7. Scale 1 = exact 2 hops: u suc2 v means v = u+2.
    suc1 = g["suc"][1]
    assert set(zip(suc1["u"].tolist(), suc1["v"].tolist())) == {
        (i, i + 2) for i in range(6)
    }
    suc2 = g["suc"][2]
    assert set(zip(suc2["u"].tolist(), suc2["v"].tolist())) == {
        (i, i + 4) for i in range(4)
    }


def test_left_right_edges_parallel_lanes():
    # Two parallel lanes 3.5 m apart, same direction; left of lane0 is lane1.
    cl0 = np.stack([np.arange(6.0), np.zeros(6)], axis=1)
    cl1 = np.stack([np.arange(6.0), np.full(6, 3.5)], axis=1)
    lanes = [
        Lane(0, cl0, left_neighbor=1),
        Lane(1, cl1, right_neighbor=0),
    ]
    g = build_lane_graph(lanes, num_scales=2, cross_dist=6.0)
    left = g["left"]
    assert len(left["u"]) == 5  # every lane-0 node pairs with nearest lane-1 node
    assert (g["lane_idcs"][left["u"]] == 0).all()
    assert (g["lane_idcs"][left["v"]] == 1).all()
    right = g["right"]
    assert (g["lane_idcs"][right["u"]] == 1).all()


def test_left_right_direction_filter():
    # Opposite-direction neighbor lanes must produce no left/right edges.
    cl0 = np.stack([np.arange(6.0), np.zeros(6)], axis=1)
    cl1 = np.stack([np.arange(5.0, -1.0, -1.0), np.full(6, 3.5)], axis=1)
    lanes = [Lane(0, cl0, left_neighbor=1), Lane(1, cl1, right_neighbor=0)]
    g = build_lane_graph(lanes, num_scales=2)
    assert len(g["left"]["u"]) == 0
    assert len(g["right"]["u"]) == 0


def test_pack_batch_offsets_and_masks():
    cfg = ModelConfig()
    pack = PackConfig(
        max_scenarios=3, max_actors=64, max_nodes=2048,
        max_edges_scale0=4096, max_edges_dilated=4096, max_edges_lr=1024,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=2048,
    )
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=6) for i in range(3)]
    batch, stats = pack_batch(scens, pack, cfg)
    assert stats["packed_scenarios"] == 3

    # Actor/node scenario ids must be monotone and consistent with masks.
    na = stats["num_actors"]
    nn = stats["num_nodes"]
    assert batch.actors.mask[:na].all() and not batch.actors.mask[na:].any()
    assert batch.graph.node_mask[:nn].all() and not batch.graph.node_mask[nn:].any()

    # Every valid edge must point at valid nodes of the same scenario.
    for nm in relation_names(cfg.num_scales):
        e = batch.graph.edges[nm]
        m = np.asarray(e.mask)
        if m.any():
            u, v = np.asarray(e.u)[m], np.asarray(e.v)[m]
            assert (u < nn).all() and (v < nn).all()
            assert (batch.graph.node_scen[u] == batch.graph.node_scen[v]).all()

    # Fusion edges respect thresholds and scenario boundaries.
    e = batch.fusion.a2m
    m = np.asarray(e.mask)
    u, v = np.asarray(e.u)[m], np.asarray(e.v)[m]
    d = np.linalg.norm(batch.graph.ctrs[u] - batch.actors.ctrs[v], axis=1)
    assert (d <= cfg.actor2map_dist + 1e-4).all()
    assert (batch.graph.node_scen[u] == batch.actors.scen[v]).all()

    # Agent rows are the first actor of each scenario and fully observed.
    assert batch.has_preds[batch.agent_idx[0]].all()


def test_pack_batch_skips_oversize_scenario():
    cfg = ModelConfig()
    pack = PackConfig(
        max_scenarios=2, max_actors=8, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=1024,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=2048,
    )
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=20) for i in range(2)]
    batch, stats = pack_batch(scens, pack, cfg)
    assert stats["packed_scenarios"] + stats["skipped_scenarios"] == 2


def test_pack_cache_identical_and_picklable():
    """Cold pack (builds per-scenario caches) and warm pack (memoized, as
    when loaded from preprocessed shards) must produce identical batches —
    including through a pickle round-trip of the cached scenarios."""
    import pickle

    cfg = ModelConfig()
    pack = PackConfig(
        max_scenarios=4, max_actors=64, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=1024,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=2048,
    )
    scens = [make_synthetic_scenario(seed=i, num_corridors=2, num_actors=6) for i in range(4)]
    import jax

    cold, s_cold = pack_batch(scens, pack, cfg)  # memoizes "_pack" on dicts
    assert all("_pack" in s for s in scens)
    warm, s_warm = pack_batch(pickle.loads(pickle.dumps(scens)), pack, cfg)
    assert s_cold == s_warm
    for a, b in zip(jax.tree.leaves(cold), jax.tree.leaves(warm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_urban_scenario_has_junction_structure():
    """Urban synthetic graphs populate the irregular paths the straight
    corridors never did: cross-lane pre/suc edges (forks/merges), multi-
    successor nodes, and intersection flags (reference maps branch/merge,
    data.py:220-361)."""
    import numpy as np

    from lanegcn_tpu.data.synthetic import make_urban_scenario

    multi_suc = inter = cross = 0
    for seed in range(6):
        g = make_urban_scenario(seed, num_corridors=6, num_actors=8)["graph"]
        suc = g["suc"][0]
        counts = np.bincount(suc["u"], minlength=g["num_nodes"])
        multi_suc += int((counts > 1).sum())
        inter += int(g["intersect"].sum())
        # cross-lane suc edges: v != u + 1 (non-banded at scale 0)
        cross += int((suc["v"] != suc["u"] + 1).sum())
        # every lane's forward reference is intact: suc_pairs non-empty
        assert len(g["suc_pairs"]) > 0
    assert multi_suc > 0, "no fork nodes generated"
    assert cross > 0, "no cross-lane successor edges"
    assert inter > 0, "no intersection-flagged nodes"


def test_urban_scenario_feeds_model_pipeline():
    """Urban scenarios pack and run through the LaneGCN forward unchanged."""
    import jax
    import numpy as np

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data.packing import pack_batch
    from lanegcn_tpu.data.synthetic import make_urban_scenario
    from lanegcn_tpu.models.lanegcn import LaneGCN

    scens = [make_urban_scenario(s, num_corridors=4, num_actors=6) for s in range(2)]
    cfg = Config(pack=PackConfig(
        max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=1024, max_edges_dilated=2048, max_edges_lr=1024,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=1024,
    ))
    batch, stats = pack_batch(scens, cfg.pack, cfg.model)
    assert stats["packed_scenarios"] == 2
    import jax.numpy as jnp

    batch = jax.tree.map(jnp.asarray, batch)
    net = LaneGCN(cfg.model)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    out = net.apply({"params": params}, batch)
    assert np.all(np.isfinite(np.asarray(out["reg"])))
