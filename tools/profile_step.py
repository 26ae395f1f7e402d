"""Component-level timing of the LaneGCN train step with honest draining.

The axon relay executes asynchronously and `jax.block_until_ready` can
return before the device has executed the queued programs (measured:
impossible dispatch rates — see docs/PERFORMANCE.md "Measurement
protocol"). Every timing here therefore fetches a scalar VALUE derived
from the timed computation inside the timed window, which forces a full
pipeline drain.

Usage: python tools/profile_step.py [component ...]
Components: step grad fwd actor map m2m fusion pred loss adam scatter bands
(default: step grad fwd)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config, relation_names
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer


def timed(name, fn, *args, iters=10, **kw):
    """Compile, then time `iters` chained executions, draining via a scalar
    fetch inside the window. fn must return a pytree; we reduce its first
    leaf to a scalar to chain + drain."""
    jfn = jax.jit(fn)
    out = jfn(*args, **kw)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])  # compile + drain
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args, **kw)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    dt = (time.time() - t0) / iters
    try:
        ca = jfn.lower(*args, **kw).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl, by = ca.get("flops", 0), ca.get("bytes accessed", 0)
    except Exception:
        fl = by = 0
    print(
        f"{name:28s} {dt*1e3:9.2f} ms   {fl/1e9:8.1f} GFLOP ({fl/dt/1e12:6.1f} TF/s)"
        f"   {by/1e9:7.1f} GB ({by/dt/1e9:6.0f} GB/s)",
        flush=True,
    )
    return dt


def main():
    want = set(sys.argv[1:]) or {"step", "grad", "fwd"}
    config = Config(pack=bench_pack_config())
    t0 = time.time()
    batches, stats, _ = make_batches(config, 1, config.pack.max_scenarios)
    batch = batches[0]
    print(f"# packed in {time.time()-t0:.1f}s", flush=True)

    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)

    if "step" in want:
        step = make_train_step(config, net, tx, lr_fn)
        # chained manually inside timed wrapper is awkward; do it directly
        p, o, m = step(params, opt_state, batch, 0.0)
        _ = float(m["loss"])
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            p, o, m = step(p, o, batch, 0.0)
        _ = float(m["loss"])
        dt = (time.time() - t0) / iters
        print(f"{'full train step':28s} {dt*1e3:9.2f} ms   → {config.pack.max_scenarios/dt:.0f} scen/s", flush=True)

    from lanegcn_tpu.models.lanegcn import pred_loss

    def loss_fn(params, batch):
        out = net.apply({"params": params}, batch)
        return pred_loss(out, batch, config.loss)["loss"]

    if "fwd" in want:
        timed("forward+loss", loss_fn, params, batch)
    if "grad" in want:
        # keep the grads live (returning only the value would DCE the bwd)
        def vg(p, b):
            v, g = jax.value_and_grad(loss_fn)(p, b)
            return v, g

        timed("value_and_grad", vg, params, batch)

    if "parts" in want:
        # per-module fwd+bwd with real cotangents: grad of sum-of-squares
        # w.r.t. the module INPUT activations (exercises the data-path VJPs)
        from lanegcn_tpu.models.actor_net import ActorNet
        from lanegcn_tpu.models.map_net import MapNet
        from lanegcn_tpu.models.fusion import A2M, M2A, A2A, M2M
        from lanegcn_tpu.models.pred_net import PredNet

        nm, na = config.model.n_map, config.model.n_actor
        nodes = jnp.zeros((batch.graph.ctrs.shape[0], nm), jnp.bfloat16)
        actors = jnp.zeros((batch.actors.ctrs.shape[0], na), jnp.bfloat16)
        a_ctrs = batch.actors.ctrs

        def bench_mod(name, mod, *args, wrt=0):
            p = mod.init(jax.random.PRNGKey(0), *args)["params"]

            def fwd(p, *a):
                return mod.apply({"params": p}, *a)

            timed(f"{name} fwd", fwd, p, *args)
            idx = wrt + 1

            def gr(p, *a):
                f = lambda x: jnp.sum(
                    jnp.asarray(
                        jax.tree.leaves(
                            fwd(p, *a[:wrt], x, *a[wrt + 1 :])
                        )[0]
                    ).astype(jnp.float32)
                    ** 2
                )
                return jax.grad(f)(a[wrt])

            timed(f"{name} fwd+bwd(x)", gr, p, *args)

        bench_mod("ActorNet", ActorNet(config.model, dtype=jnp.bfloat16), batch.actors.feats)
        bench_mod("MapNet-ish M2M", M2M(config.model, dtype=jnp.bfloat16), nodes, batch.graph)
        bench_mod(
            "A2M",
            A2M(config.model, dtype=jnp.bfloat16),
            nodes, batch.graph, actors, a_ctrs, batch.fusion.a2m,
        )
        bench_mod(
            "M2A",
            M2A(config.model, dtype=jnp.bfloat16),
            actors, a_ctrs, nodes, batch.graph.ctrs, batch.fusion.m2a,
        )
        bench_mod(
            "A2A",
            A2A(config.model, dtype=jnp.bfloat16),
            actors, a_ctrs, batch.fusion.a2a,
        )
        bench_mod(
            "PredNet",
            PredNet(config.model, dtype=jnp.bfloat16),
            actors, a_ctrs,
        )

    # Sub-modules at bench shapes.
    from lanegcn_tpu.models.actor_net import ActorNet
    from lanegcn_tpu.models.map_net import MapNet, LaneConvStack
    from lanegcn_tpu.models.fusion import A2M, M2A, A2A, M2M

    if "actor" in want:
        an = ActorNet(config.model, dtype=jnp.bfloat16)
        ap = an.init(jax.random.PRNGKey(0), batch.actors.feats)["params"]
        timed("ActorNet fwd", lambda p, x: an.apply({"params": p}, x), ap, batch.actors.feats)
        timed(
            "ActorNet grad",
            lambda p, x: jax.grad(lambda pp: an.apply({"params": pp}, x).sum())(p),
            ap,
            batch.actors.feats,
        )
    if "map" in want:
        mn = MapNet(config.model, dtype=jnp.bfloat16)
        mp = mn.init(jax.random.PRNGKey(0), batch.graph)["params"]
        timed("MapNet fwd", lambda p, g: mn.apply({"params": p}, g), mp, batch.graph)
        timed(
            "MapNet grad",
            lambda p, g: jax.grad(lambda pp: mn.apply({"params": pp}, g).sum())(p),
            mp,
            batch.graph,
        )
    if "bands" in want or "scatter" in want:
        # isolate the banded einsum vs the irregular-edge scatter inside one
        # LaneConv layer at bench shapes
        g = batch.graph
        feat = jnp.zeros((g.ctrs.shape[0], config.model.n_map), jnp.bfloat16)
        names = relation_names(config.model.num_scales)
        from lanegcn_tpu.config import band_shift
        from lanegcn_tpu.ops import masked_gather, scatter_add

        w = jnp.zeros((len(names), 128, 128), jnp.bfloat16)

        def banded(feat, bands, w):
            band_rel = [(r, n, band_shift(n)) for r, n in enumerate(names) if n in bands]
            xs = jnp.stack(
                [
                    jnp.where(bands[n][:, None], jnp.roll(feat, -s, axis=0), 0)
                    for (_, n, s) in band_rel
                ],
                0,
            )
            wb = w[jnp.asarray([r for (r, _, _) in band_rel])]
            return jnp.einsum("rnc,rcd->nd", xs, wb, preferred_element_type=jnp.bfloat16)

        def irregular(feat, w):
            temp = jnp.zeros_like(feat)
            for r, n in enumerate(names):
                e = g.edges[n]
                src = masked_gather(feat, e.v, e.mask)
                msg = jnp.matmul(src, w[r], preferred_element_type=jnp.bfloat16)
                temp = scatter_add(msg, e.u, feat.shape[0], mask=e.mask, out=temp)
            return temp

        if "bands" in want and g.bands is not None:
            timed("1 layer: banded einsum", banded, feat, g.bands, w)
            timed(
                "1 layer: banded grad",
                lambda f, b, ww: jax.grad(lambda x: banded(x, b, ww).sum())(f),
                feat,
                g.bands,
                w,
            )
        if "scatter" in want:
            timed("1 layer: irregular edges", irregular, feat, w)
            timed(
                "1 layer: irregular grad",
                lambda f, ww: jax.grad(lambda x: irregular(x, ww).sum())(f),
                feat,
                w,
            )
    if "adam" in want:
        grads = jax.tree.map(jnp.zeros_like, params)

        def adam(opt_state, grads):
            up, new_state = tx.update(grads, opt_state, params)
            return new_state

        timed("optimizer update", adam, opt_state, grads)


if __name__ == "__main__":
    main()
