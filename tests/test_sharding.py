"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lanegcn_tpu.config import Config, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import make_mesh, make_parallel_train_step, stack_packs
from lanegcn_tpu.train.optimizer import make_optimizer

TINY = PackConfig(
    max_scenarios=2, max_actors=24, max_nodes=384,
    max_edges_scale0=512, max_edges_dilated=768, max_edges_lr=128,
    max_a2m_edges=768, max_m2a_edges=768, max_a2a_edges=256,
)


def _packs(config, n, seed0=0):
    out = []
    for d in range(n):
        scens = [
            make_synthetic_scenario(seed=seed0 + 10 * d + i, num_corridors=1, num_actors=4)
            for i in range(2)
        ]
        b, _ = pack_batch(scens, config.pack, config.model)
        out.append(b)
    return out


@pytest.mark.slow
def test_parallel_train_step_runs_on_mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    config = Config(pack=TINY)
    mesh = make_mesh(jax.devices()[:4])
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)

    batch = stack_packs(_packs(config, 4))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = net.init(jax.random.PRNGKey(0), sample)["params"]
    opt_state = tx.init(params)

    step = make_parallel_train_step(config, net, tx, lr_fn, mesh)
    params, opt_state, metrics = step(params, opt_state, batch, 0.0)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_scen"]) == 8  # 4 packs × 2 scenarios

    # Params must remain replicated and finite after the update.
    leaf = jax.tree.leaves(params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_2d_mesh_graph_sharding():
    """Full train step on a (data=2, graph=2) mesh: node/edge axes sharded,
    GSPMD-inserted collectives; loss must match the 1-D data-mesh result."""
    from lanegcn_tpu.parallel import graph_batch_shardings, make_mesh_2d

    config = Config(pack=TINY)
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)
    batch = stack_packs(_packs(config, 2, seed0=80))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = net.init(jax.random.PRNGKey(2), sample)["params"]

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    shardings = graph_batch_shardings(mesh2d, batch)
    # Some leaves must actually be graph-sharded.
    from jax.sharding import PartitionSpec as P

    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(s == P("data", "graph") for s in specs)

    step2d = make_parallel_train_step(
        config, net, tx, lr_fn, mesh2d, batch_shardings=shardings
    )
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x), t)
    _, _, m2d = step2d(copy(params), tx.init(copy(params)), batch, 0.0)

    mesh1d = make_mesh(jax.devices()[:2])
    step1d = make_parallel_train_step(config, net, tx, lr_fn, mesh1d)
    _, _, m1d = step1d(copy(params), tx.init(copy(params)), batch, 0.0)

    np.testing.assert_allclose(float(m2d["loss"]), float(m1d["loss"]), rtol=1e-4)
    assert float(m2d["num_reg"]) == float(m1d["num_reg"])


@pytest.mark.slow
def test_parallel_matches_single_device_math():
    """Sharded loss+grads on a 2-device mesh == the same computation on one
    device. (Params after an Adam step are not compared: for near-zero grads
    the update is ±lr with fp-noise-dependent sign.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lanegcn_tpu.models.lanegcn import pred_loss

    config = Config(pack=TINY)
    net = LaneGCN(config.model)
    packs = _packs(config, 2, seed0=50)
    batch = stack_packs(packs)
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = net.init(jax.random.PRNGKey(1), sample)["params"]

    def mean_loss(params, batch):
        def per_pack(b):
            out = net.apply({"params": params}, b)
            return pred_loss(out, b, config.loss)["loss"]

        return jnp.mean(jax.vmap(per_pack)(batch))

    grad_fn = jax.value_and_grad(mean_loss)
    mesh2 = make_mesh(jax.devices()[:2])
    sharded = jax.jit(
        grad_fn,
        in_shardings=(NamedSharding(mesh2, P()), NamedSharding(mesh2, P("data"))),
    )
    local = jax.jit(grad_fn)

    l2, g2 = sharded(params, batch)
    l1, g1 = local(params, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
        )
