"""LaneRCNN explicit graph-parallel step (parallel/graph_parallel.py) on the
virtual CPU mesh: loss/metric parity and SGD update parity vs the 1-D
data-mesh step (reference distributed LaneRCNN training:
train_lanercnn.py, train_lrcnn_torch.py:119-124)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, ModelConfig, RoiPackConfig, TrainConfig
from lanegcn_tpu.data.dataset import RoiSyntheticDataset
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.registry import get_model
from lanegcn_tpu.parallel import (
    make_explicit_parallel_roi_train_step,
    make_mesh,
    make_mesh_2d,
    make_parallel_train_step,
    partition_roi_pack_edges,
    stack_pack_edges,
    stack_packs,
)
from lanegcn_tpu.train.optimizer import make_optimizer

pytestmark = pytest.mark.slow

TINY_ROI = RoiPackConfig(
    max_scenarios=2, max_rois=8, max_roi_nodes=768, max_interest_nodes=256,
    max_global_nodes=512, max_edges_scale0=512, max_edges_dilated=512,
    max_edges_lr=512, max_a2m_edges=256, max_pool_edges=2048, max_a2r_edges=512,
)


def _roi_packs(config, n, seed0=0):
    ds = RoiSyntheticDataset(100, num_corridors=1, num_actors=4)
    out = []
    for d in range(n):
        scens = [ds[seed0 + 10 * d + i] for i in range(2)]
        b, stats = pack_roi_batch(
            scens, config.roi_pack, config.model,
            split_bands=False, split_tables=False,
        )
        assert stats["packed_scenarios"] == 2, stats
        out.append(b)
    return out


def _setup(opt="adam"):
    config = Config(
        roi_pack=TINY_ROI,
        train=TrainConfig(opt=opt, nan_guard=(opt == "adam")),
    )
    bundle = get_model("lanercnn", config)
    config = dataclasses.replace(
        bundle.config,
        roi_pack=TINY_ROI,
        train=dataclasses.replace(
            bundle.config.train, opt=opt, nan_guard=(opt == "adam")
        ),
    )
    return config, bundle


def _run_pair(opt, seed0):
    assert len(jax.devices()) >= 8
    config, bundle = _setup(opt)
    tx, lr_fn = make_optimizer(config.train)
    packs = _roi_packs(config, 2, seed0=seed0)
    batch = stack_packs(packs)
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = bundle.net.init(jax.random.PRNGKey(3), sample)["params"]
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    se = stack_pack_edges(
        [partition_roi_pack_edges(p, config, 2) for p in packs]
    )
    se = jax.tree.map(jnp.asarray, se)
    jbatch = jax.tree.map(jnp.asarray, batch)
    step_ex = make_explicit_parallel_roi_train_step(
        config, tx, lr_fn, mesh2d, bundle.loss_fn, bundle.metrics_fn
    )
    p_ex, o_ex, m_ex = step_ex(copy(params), tx.init(copy(params)), jbatch, se, 0.0)

    mesh1d = make_mesh(jax.devices()[:2])
    step1d = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh1d, bundle.loss_fn, bundle.metrics_fn
    )
    p_1d, o_1d, m1d = step1d(copy(params), tx.init(copy(params)), batch, 0.0)
    return params, (p_ex, m_ex), (p_1d, m1d)


def test_roi_explicit_step_matches_data_mesh():
    params, (p_ex, m_ex), (p_1d, m1d) = _run_pair("adam", seed0=0)
    np.testing.assert_allclose(float(m_ex["loss"]), float(m1d["loss"]), rtol=2e-4)
    for k in m1d:
        if k.startswith("num_"):
            assert float(m_ex[k]) == float(m1d[k]), k


def test_roi_explicit_sgd_update_parity():
    """SGD updates scale linearly with gradients, so the G-fold inflation
    mode (psum instead of pmean over the graph axis) fails this by 2x."""
    params, (p_ex, _), (p_1d, _) = _run_pair("sgd", seed0=40)
    du_ex = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), p_ex, params)
    du_1d = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), p_1d, params)
    flat_ex = np.concatenate([x.ravel() for x in jax.tree.leaves(du_ex)])
    flat_1d = np.concatenate([x.ravel() for x in jax.tree.leaves(du_1d)])
    scale = np.linalg.norm(flat_ex) / max(np.linalg.norm(flat_1d), 1e-12)
    assert abs(scale - 1.0) < 0.02, f"update-norm ratio {scale}"
    np.testing.assert_allclose(flat_ex, flat_1d, rtol=5e-2, atol=5e-5)
