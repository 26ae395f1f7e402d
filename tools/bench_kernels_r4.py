"""Microbench: split the LaneConv stacks' Pallas time between the fused
band layer (ops/pallas_lane_layer) and the scenario-window aggregation
(ops/pallas_scenario_agg) at exact bench shapes, fwd and fwd+bwd, drained
protocol. Decides where round 4's backward-cutting work goes
(VERDICT r3 weak #1: bwd 35 ms vs fwd 15 ms across both stacks).

Usage: python tools/bench_kernels_r4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config, band_shift, relation_names


REPS = int(os.environ.get("KB_REPS", "20"))


def drained(fn, args, iters=5, label=""):
    """fn(*args) -> pytree; chained REPS times inside ONE jitted program
    (the first leaf feeds back as args[0]) so relay dispatch overhead
    amortizes; timed over `iters` dispatches ending in a value fetch."""

    def chain(*a):
        x = a[0]
        for _ in range(REPS):
            out = fn(x, *a[1:])
            leaves = jax.tree.leaves(out)
            extra = sum((jnp.sum(l) for l in leaves[1:]), jnp.float32(0.0))
            x = (leaves[0] * 0.999 + extra.astype(leaves[0].dtype) * 1e-30
                 ).astype(a[0].dtype)
            x = x[: a[0].shape[0]] if x.shape != a[0].shape else x
        return x

    cfn = jax.jit(chain)
    out = cfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = cfn(*args)
    _ = float(jnp.sum(out))  # value fetch: drains the pipeline
    dt = (time.time() - t0) / (iters * REPS)
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    config = Config(pack=bench_pack_config())
    batches, stats, _ = make_batches(config, 1, config.pack.max_scenarios)
    batch = batches[0]
    g = batch.graph
    n, c = g.ctrs.shape[0], config.model.n_map
    names = relation_names(config.model.num_scales)
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(n, c) * 0.1, dt)
    temp = jnp.asarray(rng.randn(n, c) * 0.1, dt)
    w_rel = jnp.asarray(rng.randn(len(names), c, c) * 0.05, dt)
    print(f"# N={n} C={c} stride={config.pack.node_stride} "
          f"windows={n // config.pack.node_stride} "
          f"plan_rows={g.plan_lu.shape[0]} "
          f"valid={int(np.sum(np.asarray(g.plan_lu) >= 0))}")

    # --- scenario-window aggregation kernel ---
    from lanegcn_tpu.ops.pallas_scenario_agg import scenario_aggregate

    num_scen = g.plan_scen

    agg = jax.jit(lambda f, t, w: scenario_aggregate(
        f, t, w, g.plan_lu, g.plan_lv, g.plan_rel, num_scen))
    drained(agg, (feat, temp, w_rel), label="window-agg fwd")

    def agg_loss(f, t, w):
        return jnp.sum(scenario_aggregate(
            f, t, w, g.plan_lu, g.plan_lv, g.plan_rel, num_scen
        ).astype(jnp.float32))

    agg_grad = jax.jit(jax.grad(agg_loss, argnums=(0, 1, 2)))
    drained(agg_grad, (feat, temp, w_rel), label="window-agg fwd+bwd (grad)")

    # --- fused band layer kernel ---
    from lanegcn_tpu.ops.pallas_lane_layer import fused_lane_layer

    band_rel = [(r, nm) for r, nm in enumerate(names) if nm in (g.bands or {})]
    shifts = tuple(band_shift(nm) for _, nm in band_rel)
    masks = jnp.stack([g.bands[nm] for _, nm in band_rel], 0).astype(dt)
    wb = w_rel[jnp.asarray([r for r, _ in band_rel])]
    w2 = jnp.asarray(rng.randn(c, c) * 0.05, dt)
    g1w = jnp.ones((c,), jnp.float32)
    g1b = jnp.zeros((c,), jnp.float32)

    lane = jax.jit(lambda f, t: fused_lane_layer(
        f, t, masks, wb, w2, g1w, g1b, g1w, g1b, shifts))
    drained(lane, (feat, temp), label="band-layer fwd")

    def lane_loss(f, t):
        return jnp.sum(fused_lane_layer(
            f, t, masks, wb, w2, g1w, g1b, g1w, g1b, shifts
        ).astype(jnp.float32))

    lane_grad = jax.jit(jax.grad(lane_loss, argnums=(0, 1)))
    drained(lane_grad, (feat, temp), label="band-layer fwd+bwd (grad)")

    # --- the classic spill path for context ---
    from lanegcn_tpu.ops import masked_gather, scatter_add

    def spill(f, t, w):
        msgs, dsts, msks = [], [], []
        for r, nm in enumerate(names):
            e = g.edges[nm]
            src = masked_gather(f, e.v, e.mask)
            msgs.append(jnp.matmul(src, w[r], preferred_element_type=dt))
            dsts.append(e.u)
            msks.append(e.mask)
        return scatter_add(
            jnp.concatenate(msgs), jnp.concatenate(dsts), n,
            mask=jnp.concatenate(msks), out=t)

    spill_j = jax.jit(spill)
    drained(spill_j, (feat, temp, w_rel), label="spill-list gather+scatter fwd")

    spill_grad = jax.jit(jax.grad(
        lambda f, t, w: jnp.sum(spill(f, t, w).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    drained(spill_grad, (feat, temp, w_rel), label="spill-list fwd+bwd (grad)")


if __name__ == "__main__":
    main()
