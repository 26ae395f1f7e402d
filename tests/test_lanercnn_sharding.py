"""LaneRCNN multi-device sharding on the virtual CPU mesh.

The reference trains LaneRCNN distributed (reference train_lanercnn.py,
horovod allreduce); our counterpart is the same stacked-pack SPMD path used
for LaneGCN (parallel/sharding.py) with the RoI loss/metrics plugged in.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, RoiPackConfig
from lanegcn_tpu.data import make_synthetic_scenario
from lanegcn_tpu.data.lane_roi import generate_lane_rois
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.registry import get_model
from lanegcn_tpu.parallel import (
    graph_batch_shardings,
    make_mesh,
    make_mesh_2d,
    make_parallel_train_step,
    stack_packs,
)
from lanegcn_tpu.train.optimizer import make_optimizer

pytestmark = pytest.mark.slow

TINY_ROI = RoiPackConfig(
    max_scenarios=2,
    max_rois=16,
    max_roi_nodes=2048,
    max_interest_nodes=256,
    max_edges_scale0=3072,
    max_edges_dilated=4096,
    max_edges_lr=3072,
    max_a2m_edges=512,
    max_pool_edges=6144,
    max_a2r_edges=1024,
)


def _roi_packs(config, n, seed0=0):
    packs = []
    for d in range(n):
        scens = []
        for i in range(2):
            s = make_synthetic_scenario(
                seed=seed0 + 10 * d + i, num_corridors=1, num_actors=4
            )
            scens.append(generate_lane_rois(s))
        b, stats = pack_roi_batch(scens, config.roi_pack, config.model)
        assert stats["packed_scenarios"] == 2, stats
        packs.append(b)
    return packs


def _setup(n_packs, seed0=0):
    config = Config(roi_pack=TINY_ROI)
    bundle = get_model("lanercnn", config)
    config = bundle.config
    tx, lr_fn = make_optimizer(config.train)
    batch = stack_packs(_roi_packs(config, n_packs, seed0))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = bundle.net.init(jax.random.PRNGKey(0), sample)["params"]
    return config, bundle, tx, lr_fn, batch, params


def test_lanercnn_parallel_train_step_runs_on_mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    config, bundle, tx, lr_fn, batch, params = _setup(2)
    mesh = make_mesh(jax.devices()[:2])
    step = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
    )
    params, _, metrics = step(params, tx.init(params), batch, 0.0)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_scen"]) == 4  # 2 packs × 2 scenarios
    leaf = jax.tree.leaves(params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_lanercnn_2d_mesh_graph_sharding_matches_1d():
    """(data=2, graph=2) mesh with RoI node/edge axes sharded must reproduce
    the 1-D data-mesh loss (GSPMD boundary collectives are numerics-neutral)."""
    from jax.sharding import PartitionSpec as P

    config, bundle, tx, lr_fn, batch, params = _setup(2, seed0=60)

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    shardings = graph_batch_shardings(mesh2d, batch)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(s == P("data", "graph") for s in specs)

    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    step2d = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh2d,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
        batch_shardings=shardings,
    )
    _, _, m2d = step2d(copy(params), tx.init(copy(params)), batch, 0.0)

    mesh1d = make_mesh(jax.devices()[:2])
    step1d = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh1d,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
    )
    _, _, m1d = step1d(copy(params), tx.init(copy(params)), batch, 0.0)

    np.testing.assert_allclose(float(m2d["loss"]), float(m1d["loss"]), rtol=1e-4)
