"""Parity + packer routing for the window-pair LaneConv aggregation
(ops/pallas_pair_agg + PackConfig.spill_pairs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanegcn_tpu.data.packing import build_pair_plan
from lanegcn_tpu.graph import PairPlan
from lanegcn_tpu.ops.pallas_pair_agg import pair_aggregate

S, STRIDE, C, R, CHUNK = 6, 64, 128, 14, 16
N = S * STRIDE


def _plan(seed=0, n_edges=250, cap=1024):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, N, n_edges).astype(np.int64)
    v = rng.randint(0, N, n_edges).astype(np.int64)
    rel = rng.randint(0, R, n_edges).astype(np.int32)
    d, dropped, (ru, rv, rr) = build_pair_plan(
        u, v, STRIDE, STRIDE, cap, CHUNK, rel=rel, return_residue=True
    )
    plan = PairPlan(
        idx=jnp.asarray(np.concatenate([d["lu"], d["lv"], d["rel"]], axis=1)),
        meta=jnp.asarray(np.stack([
            d["dwin"], d["swin"], d["first"],
            d["sperm"], d["sswin"], d["sfirst"],
        ])),
        chunk=CHUNK, dst_stride=STRIDE, src_stride=STRIDE,
    )
    return plan, (u, v, rel), dropped, (ru, rv, rr)


def _np_oracle(u, v, rel, feat, temp, w):
    out = temp.copy()
    msg = np.einsum("ec,ecd->ed", feat[v], w[rel])
    np.add.at(out, u, msg)
    return out


def test_pair_plan_residue_roundtrip():
    plan, (u, v, rel), dropped, (ru, rv, rr) = _plan(cap=128)
    assert dropped == len(ru) > 0
    lu = np.asarray(plan.lu[:, 0])
    assert int((lu >= 0).sum()) + dropped == len(u)
    # Admitted + residue reconstruct the original multiset.
    nc = plan.meta.shape[1]
    ch_idx = np.arange(len(lu)) // CHUNK
    valid = lu >= 0
    gu = np.asarray(plan.dwin)[ch_idx[valid]] * STRIDE + lu[valid]
    gv = np.asarray(plan.swin)[ch_idx[valid]] * STRIDE + np.asarray(plan.lv[:, 0])[valid]
    gr = np.asarray(plan.rel[:, 0])[valid]
    got = sorted(zip(gu.tolist(), gv.tolist(), gr.tolist())) + sorted(
        zip(ru.tolist(), rv.tolist(), rr.tolist())
    )
    want = sorted(zip(u.tolist(), v.tolist(), rel.tolist()))
    assert sorted(got) == want


def test_pair_agg_parity():
    plan, (u, v, rel), dropped, _ = _plan()
    assert dropped == 0
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(N, C) * 0.2, jnp.float32)
    temp = jnp.asarray(rng.randn(N, C) * 0.2, jnp.float32)
    w = jnp.asarray(rng.randn(R, C, C) * 0.1, jnp.float32)
    out_x = pair_aggregate(feat, temp, w, plan, mode="xla")
    out_k = pair_aggregate(feat, temp, w, plan, mode="interpret")
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )
    oracle = _np_oracle(
        u, v, rel, *(np.asarray(a, np.float64) for a in (feat, temp)),
        np.asarray(w, np.float64),
    )
    np.testing.assert_allclose(np.asarray(out_k), oracle, rtol=2e-3, atol=2e-3)


def test_pair_agg_grad_parity():
    plan, _, dropped, _ = _plan(seed=3, n_edges=180)
    assert dropped == 0
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(N, C) * 0.2, jnp.float32)
    temp = jnp.asarray(rng.randn(N, C) * 0.2, jnp.float32)
    w = jnp.asarray(rng.randn(R, C, C) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.randn(N, C), jnp.float32)

    def loss(mode, f, t, ww):
        return jnp.sum(pair_aggregate(f, t, ww, plan, mode=mode) * cot)

    gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(feat, temp, w)
    gk = jax.grad(lambda *a: loss("interpret", *a), argnums=(0, 1, 2))(feat, temp, w)
    for nm, a, b in zip(("feat", "temp", "w"), gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3,
            err_msg=f"grad mismatch: {nm}",
        )


def test_spill_pairs_model_equivalence():
    """Pack the same scenarios with and without spill_pairs: identical
    masked loss + parameter gradients (the spill edges move from the
    classic lists into the pair plan, semantics unchanged)."""
    from jax.flatten_util import ravel_pytree

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.lanegcn import LaneGCN

    base = dict(
        max_scenarios=2,
        max_actors=64,
        max_nodes=1024,
        node_stride=256,
        # A tiny per-window budget forces real plan residue for the pair
        # plan to absorb (budget overflow spills at every window).
        max_plan_edges=64,
        max_edges_scale0=1536,
        max_edges_dilated=2048,
        max_edges_lr=512,
        max_a2m_edges=2048,
        max_m2a_edges=2048,
        max_a2a_edges=1024,
        # left/right ride the plan (not tables): with the tiny budget they
        # overflow into the residue the pair plan must absorb.
        table_relations=(),
    )
    cfg_a = Config(pack=PackConfig(**base))
    cfg_b = Config(pack=PackConfig(
        **base, spill_pairs=True, max_spill_pair_edges=8192, pair_chunk=64,
    ))
    scens = [
        make_synthetic_scenario(seed=70 + i, num_corridors=2, num_actors=8)
        for i in range(2)
    ]
    b_a, st_a = pack_batch(scens, cfg_a.pack, cfg_a.model)
    b_b, st_b = pack_batch(scens, cfg_b.pack, cfg_b.model)
    assert st_b.get("spill_pair_edges", 0) > 0, st_b
    assert b_b.graph.spill_pair is not None
    # With a generous pair capacity the classic lists should be empty.
    assert all(
        int(np.asarray(e.mask).sum()) == 0
        for e in b_b.graph.edges.values()
    ), {k: int(np.asarray(e.mask).sum()) for k, e in b_b.graph.edges.items()}
    b_a = jax.tree.map(jnp.asarray, b_a)
    b_b = jax.tree.map(jnp.asarray, b_b)

    net = LaneGCN(cfg_a.model)
    params = net.init(jax.random.PRNGKey(0), b_a)["params"]

    def loss(p, b):
        out = net.apply({"params": p}, b)
        m = b.actors.mask[:, None]
        return (
            jnp.sum((out["reg"] * m[:, :, None, None]) ** 2) / 1e3
            + jnp.sum((out["cls"] * m) ** 2)
        )

    la, ga = jax.value_and_grad(loss)(params, b_a)
    lb, gb = jax.value_and_grad(loss)(params, b_b)
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-4)
    fa, _ = ravel_pytree(ga)
    fb, _ = ravel_pytree(gb)
    scale = float(jnp.max(jnp.abs(fa))) or 1.0
    np.testing.assert_allclose(
        np.asarray(fb) / scale, np.asarray(fa) / scale, rtol=2e-4, atol=2e-4
    )
