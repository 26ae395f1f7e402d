"""Explicit graph-parallel train step (parallel/graph_parallel.py) on the
virtual CPU mesh: loss/metric parity vs the 1-D data-mesh step, the shard
partitioner's invariants, and the CLI `--mesh DxG` wiring."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import (
    make_explicit_parallel_train_step,
    make_mesh,
    make_mesh_2d,
    make_parallel_train_step,
    partition_stacked_edges,
    stack_packs,
)
from lanegcn_tpu.train.optimizer import make_optimizer

TINY = PackConfig(
    max_scenarios=2, max_actors=24, max_nodes=384,
    max_edges_scale0=512, max_edges_dilated=768, max_edges_lr=128,
    max_a2m_edges=768, max_m2a_edges=768, max_a2a_edges=256,
)


def _flat_packs(config, n, seed0=0):
    out = []
    for d in range(n):
        scens = [
            make_synthetic_scenario(seed=seed0 + 10 * d + i, num_corridors=1, num_actors=4)
            for i in range(2)
        ]
        b, stats = pack_batch(
            scens, config.pack, config.model, split_bands=False, split_tables=False
        )
        assert stats["packed_scenarios"] == 2, stats
        out.append(b)
    return out


def test_partition_covers_every_valid_edge():
    config = Config(pack=TINY)
    batch = stack_packs(_flat_packs(config, 2))
    se = partition_stacked_edges(batch, config, 2)
    n_nodes = config.pack.max_nodes
    rows = n_nodes // 2
    for nm, e in se["graph"].items():
        orig = batch.graph.edges[nm]
        total_valid = int(np.asarray(orig.mask).sum())
        assert int(np.asarray(e.mask).sum()) == total_valid, nm
        # shard-local v must be in range; u stays pack-global.
        v = np.asarray(e.v)[np.asarray(e.mask)]
        assert v.size == 0 or (0 <= v).all() and (v < rows).all(), nm


@pytest.mark.slow
def test_explicit_step_matches_data_mesh():
    """Same flat packs: explicit (data=2, graph=2) shard_map step must
    reproduce the 1-D data-mesh loss and metric sums."""
    assert len(jax.devices()) >= 8
    config = Config(pack=TINY)
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)
    batch = stack_packs(_flat_packs(config, 2, seed0=30))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = net.init(jax.random.PRNGKey(4), sample)["params"]
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    se = jax.tree.map(jnp.asarray, partition_stacked_edges(batch, config, 2))
    jbatch = jax.tree.map(jnp.asarray, batch)
    step_ex = make_explicit_parallel_train_step(config, tx, lr_fn, mesh2d)
    p_ex, o_ex, m_ex = step_ex(copy(params), tx.init(copy(params)), jbatch, se, 0.0)

    mesh1d = make_mesh(jax.devices()[:2])
    step1d = make_parallel_train_step(config, net, tx, lr_fn, mesh1d)
    p_1d, o_1d, m1d = step1d(copy(params), tx.init(copy(params)), batch, 0.0)

    np.testing.assert_allclose(float(m_ex["loss"]), float(m1d["loss"]), rtol=1e-4)
    assert float(m_ex["num_reg"]) == float(m1d["num_reg"])
    assert float(m_ex["num_cls"]) == float(m1d["num_cls"])
    np.testing.assert_allclose(float(m_ex["ade_sum"]), float(m1d["ade_sum"]), rtol=1e-4)
    assert float(m_ex["num_scen"]) == float(m1d["num_scen"])

    # Second step from each path's own updated params: if the gradients had
    # diverged beyond fp noise, the step-2 losses would drift apart.
    _, _, m_ex2 = step_ex(p_ex, o_ex, jbatch, se, 0.0)
    _, _, m1d2 = step1d(p_1d, o_1d, batch, 0.0)
    np.testing.assert_allclose(float(m_ex2["loss"]), float(m1d2["loss"]), rtol=5e-3)


@pytest.mark.slow
def test_explicit_step_sgd_update_parity():
    """SGD parameter-update parity between the explicit (data=2, graph=2)
    step and the 1-D data-mesh step. Unlike the Adam leg above, SGD updates
    scale linearly with the gradient, so a uniform G x gradient inflation
    (the round-2 psum-over-graph bug: replicated loss + all_gather VJP
    summing G identical cotangents) fails this test by exactly mesh G."""
    import dataclasses

    assert len(jax.devices()) >= 8
    from lanegcn_tpu.config import TrainConfig

    config = Config(pack=TINY, train=TrainConfig(opt="sgd", nan_guard=False))
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)
    batch = stack_packs(_flat_packs(config, 2, seed0=60))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = net.init(jax.random.PRNGKey(7), sample)["params"]
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    se = jax.tree.map(jnp.asarray, partition_stacked_edges(batch, config, 2))
    jbatch = jax.tree.map(jnp.asarray, batch)
    step_ex = make_explicit_parallel_train_step(config, tx, lr_fn, mesh2d)
    p_ex, _, _ = step_ex(copy(params), tx.init(copy(params)), jbatch, se, 0.0)

    mesh1d = make_mesh(jax.devices()[:2])
    step1d = make_parallel_train_step(config, net, tx, lr_fn, mesh1d)
    p_1d, _, _ = step1d(copy(params), tx.init(copy(params)), batch, 0.0)

    # Compare the UPDATES (p_new - p_old), not the params, so the shared
    # initialization can't hide a scale error.
    du_ex = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), p_ex, params)
    du_1d = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), p_1d, params)
    flat_ex = np.concatenate([x.ravel() for x in jax.tree.leaves(du_ex)])
    flat_1d = np.concatenate([x.ravel() for x in jax.tree.leaves(du_1d)])
    scale = np.linalg.norm(flat_ex) / max(np.linalg.norm(flat_1d), 1e-12)
    assert abs(scale - 1.0) < 0.02, f"update-norm ratio {scale} (G-inflation?)"
    np.testing.assert_allclose(flat_ex, flat_1d, rtol=2e-2, atol=2e-5)


def test_partition_overflow_drops_not_raises(capsys):
    """A shard-capacity overflow must degrade (drop + warn), not raise
    mid-training."""
    config = Config(pack=TINY)
    batch = stack_packs(_flat_packs(config, 1))
    # slack tiny enough that shard caps certainly overflow
    se = partition_stacked_edges(batch, config, 2, slack=0.01)
    out = capsys.readouterr().out
    assert "dropped" in out, out
    # the partition is still well-formed: every mask row has valid entries
    for nm, e in se["graph"].items():
        assert np.asarray(e.u).shape[-1] >= 1, nm


@pytest.mark.slow
def test_cli_explicit_graph_parallel(tmp_path):
    """`train --mesh 2x2` runs the explicit shard_map path end to end."""
    from lanegcn_tpu.cli import main

    save_dir = str(tmp_path / "run")
    stdout = sys.stdout
    try:
        main([
            "train", "--model", "lanegcn", "--data", "synthetic:8:1:4",
            "--epochs", "1", "--batch-size", "2", "--save-dir", save_dir,
            "--display-every", "2", "--mesh", "2x2",
            "--graph-parallel", "explicit",
        ])
    finally:
        sys.stdout = stdout
    log = open(os.path.join(save_dir, "log")).read()
    assert "explicit shard_map" in log, log
    assert "loss" in log, log
