"""Parity + invariants for the window-pair fused edge kernel
(ops/pallas_win_edge) and the packer's pair-plan builder
(data/packing.build_pair_plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanegcn_tpu.data.packing import build_pair_plan
from lanegcn_tpu.graph import PairPlan
from lanegcn_tpu.ops.pallas_win_edge import win_edge_mlp


def _random_edges(rng, n_edges, nd, ns):
    u = rng.randint(0, nd, size=n_edges).astype(np.int64)
    v = rng.randint(0, ns, size=n_edges).astype(np.int64)
    return u, v


def _plan(u, v, sd, ss, cap, chunk):
    d, dropped = build_pair_plan(u, v, sd, ss, cap, chunk)
    plan = PairPlan(
        idx=jnp.asarray(np.concatenate([d["lu"], d["lv"]], axis=1)),
        meta=jnp.asarray(np.stack([
            d["dwin"], d["swin"], d["first"],
            d["sperm"], d["sswin"], d["sfirst"],
        ])),
        chunk=chunk, dst_stride=sd, src_stride=ss,
    )
    return plan, dropped


def _np_oracle(u, v, pd, qd, ps, cs, temp, weights, has_dist2, has_query, eps=1e-5):
    """Edge-list formulation in float64 numpy — independent of both the
    kernel and its XLA reference."""
    kd_b, kdo, gdow, gdob, k1, gchw, gchb, kout = weights

    def gn(t, w, b):
        mu = t.mean(1, keepdims=True)
        var = ((t - mu) ** 2).mean(1, keepdims=True)
        return (t - mu) / np.sqrt(var + eps) * w + b

    t1 = np.maximum(pd[u] + ps[v] + kd_b, 0.0)
    t2 = np.maximum(gn(t1 @ kdo, gdow, gdob), 0.0) if has_dist2 else t1
    s = t2 @ k1 + cs[v]
    if has_query:
        s = s + qd[u]
    e1 = np.maximum(gn(s, gchw, gchb), 0.0)
    e2 = e1 @ kout
    out = temp.copy()
    np.add.at(out, u, e2)
    return out


@pytest.mark.parametrize("has_dist2,has_query", [(True, True), (False, False)])
def test_build_pair_plan_invariants(has_dist2, has_query):
    rng = np.random.RandomState(0)
    sd, ss, chunk = 64, 32, 16
    nd, ns = sd * 6, ss * 4
    u, v = _random_edges(rng, 300, nd, ns)
    d, dropped = build_pair_plan(u, v, sd, ss, 512, chunk)
    assert dropped == 0
    lu, lv = d["lu"][:, 0], d["lv"][:, 0]
    valid = lu >= 0
    assert valid.sum() == len(u)
    nc = d["dwin"].shape[0]
    ch_idx = np.arange(len(lu)) // chunk
    ru = d["dwin"][ch_idx[valid]] * sd + lu[valid]
    rv = d["swin"][ch_idx[valid]] * ss + lv[valid]
    # Reconstruction: same multiset of edges.
    got = sorted(zip(ru.tolist(), rv.tolist()))
    want = sorted(zip(u.tolist(), v.tolist()))
    assert got == want
    # Every chunk is (dwin, swin)-pure by construction; dwin runs contiguous.
    dw = d["dwin"]
    changes = np.nonzero(np.diff(dw))[0] + 1
    seen = set()
    prev = dw[0]
    seen.add(int(prev))
    for i in changes:
        assert int(dw[i]) not in seen or not (d["lu"][i * chunk] >= 0), (
            "dwin run split"
        )
        seen.add(int(dw[i]))
    # first flags mark exactly the run starts (active prefix).
    assert d["first"][0] == 1
    act = int(np.searchsorted(np.cumsum(valid.reshape(nc, chunk).any(1)), 1))
    # sperm is a permutation; sswin matches swin through it.
    assert sorted(d["sperm"].tolist()) == list(range(nc))
    np.testing.assert_array_equal(
        d["swin"][d["sperm"][: nc]], np.where(
            np.arange(nc) < nc, d["sswin"], d["sswin"]
        )[: nc] if True else d["sswin"],
    )
    # swin runs contiguous in sperm order over active chunks.
    sw = d["sswin"]
    assert sw.shape == (nc,)


def test_pair_plan_dropped_counter():
    rng = np.random.RandomState(1)
    u, v = _random_edges(rng, 500, 256, 128)
    d, dropped = build_pair_plan(u, v, 64, 32, 128, 16)
    lu = d["lu"][:, 0]
    assert dropped > 0
    assert (lu >= 0).sum() + dropped == 500


@pytest.mark.parametrize("has_dist2,has_query", [
    (True, True),    # Att chain
    (False, False),  # LanePooling chain
])
def test_win_edge_parity(has_dist2, has_query):
    rng = np.random.RandomState(2)
    sd, ss, chunk, c = 32, 16, 16, 128
    nd, ns = sd * 5, ss * 3
    u, v = _random_edges(rng, 200, nd, ns)
    plan, dropped = _plan(u, v, sd, ss, 512, chunk)
    assert dropped == 0

    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    pd, qd = r(nd, c), r(nd, c)
    ps, cs = r(ns, c), r(ns, c)
    temp = r(nd, c)
    bd = r(c)
    kdo, gdow, gdob = r(c, c), r(c) + 1.0, r(c)
    k1, gchw, gchb = r(c, c), r(c) + 1.0, r(c)
    kout = r(c, c)
    args = (pd, qd if has_query else None, ps, cs, temp, bd, kdo, gdow, gdob,
            k1, gchw, gchb, kout)

    out_xla = win_edge_mlp(*args, plan, has_dist2, has_query, mode="xla")
    out_ker = win_edge_mlp(*args, plan, has_dist2, has_query, mode="interpret")
    np.testing.assert_allclose(
        np.asarray(out_ker), np.asarray(out_xla), rtol=2e-4, atol=2e-4
    )

    # Independent float64 oracle over the ORIGINAL edge list.
    weights = tuple(
        np.asarray(a, np.float64)
        for a in (bd, kdo, gdow, gdob, k1, gchw, gchb, kout)
    )
    oracle = _np_oracle(
        u, v, *(np.asarray(a, np.float64) for a in (pd, qd, ps, cs, temp)),
        weights, has_dist2, has_query,
    )
    np.testing.assert_allclose(np.asarray(out_ker), oracle, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("has_dist2,has_query", [
    (True, True),
    (False, False),
])
def test_win_edge_grad_parity(has_dist2, has_query):
    rng = np.random.RandomState(3)
    sd, ss, chunk, c = 32, 16, 16, 128
    nd, ns = sd * 4, ss * 3
    u, v = _random_edges(rng, 150, nd, ns)
    plan, _ = _plan(u, v, sd, ss, 384, chunk)

    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    pd, qd = r(nd, c), r(nd, c)
    ps, cs = r(ns, c), r(ns, c)
    temp = r(nd, c)
    bd = r(c)
    kdo, gdow, gdob = r(c, c), r(c) + 1.0, r(c)
    k1, gchw, gchb = r(c, c), r(c) + 1.0, r(c)
    kout = r(c, c)
    cot = r(nd, c)

    def loss(mode, *args):
        out = win_edge_mlp(
            args[0], args[1] if has_query else None, *args[2:], plan,
            has_dist2, has_query, mode=mode,
        )
        return jnp.sum(out * cot)

    args = (pd, qd, ps, cs, temp, bd, kdo, gdow, gdob, k1, gchw, gchb, kout)
    argnums = tuple(range(len(args)))
    g_xla = jax.grad(lambda *a: loss("xla", *a), argnums=argnums)(*args)
    g_ker = jax.grad(lambda *a: loss("interpret", *a), argnums=argnums)(*args)
    names = ["pd", "qd", "ps", "cs", "temp", "bd", "kdo", "gdow", "gdob",
             "k1", "gchw", "gchb", "kout"]
    for nm, gx, gk in zip(names, g_xla, g_ker):
        if nm == "qd" and not has_query:
            continue
        if nm in ("kdo", "gdow", "gdob") and not has_dist2:
            continue
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), rtol=3e-3, atol=3e-3,
            err_msg=f"grad mismatch for {nm}",
        )


def test_win_edge_empty_plan():
    """A plan with zero edges must return temp unchanged (fwd) and zero
    input cotangents (bwd)."""
    sd, ss, chunk, c = 32, 16, 16, 128
    nd, ns = sd * 2, ss * 2
    plan, _ = _plan(np.zeros(0, np.int64), np.zeros(0, np.int64), sd, ss, 64, chunk)
    rng = np.random.RandomState(4)
    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.float32)
    args = (r(nd, c), r(nd, c), r(ns, c), r(ns, c), r(nd, c), r(c), r(c, c),
            r(c) + 1, r(c), r(c, c), r(c) + 1, r(c), r(c, c))
    out = win_edge_mlp(*args, plan, True, True, mode="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(args[4]), rtol=1e-6)
    g = jax.grad(
        lambda pd: jnp.sum(win_edge_mlp(pd, *args[1:], plan, True, True,
                                        mode="interpret"))
    )(args[0])
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_fusion_pairs_model_parity():
    """Full-model loss + parameter gradients: the window-pair fused Att path
    (PackConfig.fusion_pairs + actor_stride, xla mode on CPU) must match the
    classic EdgeSet path on the same scenarios."""
    from jax.flatten_util import ravel_pytree

    from lanegcn_tpu.config import Config, PackConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.lanegcn import LaneGCN

    base = dict(
        max_scenarios=2,
        max_actors=64,
        max_nodes=1024,
        node_stride=512,
        max_plan_edges=512,
        max_edges_scale0=1536,
        max_edges_dilated=2048,
        max_edges_lr=512,
        max_a2m_edges=2048,
        max_m2a_edges=2048,
        max_a2a_edges=1024,
    )
    cfg_a = Config(pack=PackConfig(**base))
    cfg_b = Config(pack=PackConfig(**base, actor_stride=32, fusion_pairs=True))

    scens = [
        make_synthetic_scenario(seed=60 + i, num_corridors=2, num_actors=8)
        for i in range(2)
    ]
    b_a, st_a = pack_batch(scens, cfg_a.pack, cfg_a.model)
    b_b, st_b = pack_batch(scens, cfg_b.pack, cfg_b.model)
    assert st_a["packed_scenarios"] == st_b["packed_scenarios"] == 2
    assert st_b["dropped_pair_a2m"] == 0
    assert st_b["dropped_pair_m2a"] == 0
    assert st_b["dropped_pair_a2a"] == 0
    assert b_b.fusion.pair_a2m is not None
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
