"""Per-shard step time: FLAT formulation vs the FAST path, one real chip.

VERDICT r3 #2: the explicit source-partitioned multi-chip path consumes
flat packs and computes per shard with the einsum/masked-scatter
formulation — this tool measures what that costs vs the shipped fast path
(bands + window plan + pair-fused Att) on the SAME 256 urban scenarios,
plus the fast path at sub-pack sizes (what each shard of the WINDOWED
scenario-aligned path runs at graph=G). Drained protocol throughout.

Usage: python tools/bench_flat_vs_fast.py   (alone — owns the TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import (
    make_explicit_parallel_train_step,
    partition_stacked_edges,
    stack_packs,
)
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer

ITERS = int(os.environ.get("FVF_ITERS", "30"))


def drained_steps(step, args_fn, iters=ITERS, label=""):
    state = args_fn()
    t0 = time.time()
    state = step(*state)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        state = step(*state)
    loss = float(state[2]["loss"])  # value fetch drains the pipeline
    dt = (time.time() - t0) / iters
    print(f"{label:48s} {dt*1e3:8.2f} ms/step  (compile+1st {compile_s:.1f}s, "
          f"loss {loss:.3f})", flush=True)
    return dt


def fast_leg(num_scen, label):
    config = Config(pack=bench_pack_config(num_scen))
    batches, _, _ = make_batches(config, 1, num_scen)
    batch = batches[0]
    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    tx, lr_fn = make_optimizer(config.train)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    step = make_train_step(config, net, tx, lr_fn)

    def args():
        return (params, tx.init(params), {"loss": jnp.float32(0)})

    def stepper(p, o, _m):
        return step(p, o, batch, 0.0)

    return drained_steps(stepper, args, label=label)


def flat_leg(num_scen):
    import dataclasses

    os.environ["BENCH_PLAN"] = "0"
    base = bench_pack_config(num_scen)
    os.environ.pop("BENCH_PLAN")
    # Flat packs carry EVERY edge in the per-relation lists (no bands/
    # tables/plans) — capacities sized to the measured urban occupancy.
    config = Config(pack=dataclasses.replace(
        base,
        max_edges_scale0=188416,
        max_edges_dilated=(184320, 180224, 165888, 167936, 122880),
        max_edges_lr=98304,
    ))
    from lanegcn_tpu.data import pack_batch
    from lanegcn_tpu.data.synthetic import make_urban_scenario

    scens = [
        make_urban_scenario(seed=i, num_corridors=7, num_actors=16)
        for i in range(num_scen)
    ]
    flat, st = pack_batch(
        scens, config.pack, config.model,
        split_bands=False, split_tables=False, scenario_plan=False,
    )
    drops = {k: v for k, v in st.items() if k.startswith("dropped") and v}
    print(f"# flat pack: {st['num_nodes']} nodes, drops={drops}", flush=True)
    batch = stack_packs([flat])
    se = jax.tree.map(jnp.asarray, partition_stacked_edges(batch, config, 1))
    batch = jax.tree.map(jnp.asarray, batch)
    net = LaneGCN(config.model)
    sample = jax.tree.map(lambda x: x[0], batch)
    params = net.init(jax.random.PRNGKey(0), sample)["params"]
    tx, lr_fn = make_optimizer(config.train)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "graph"))
    step = make_explicit_parallel_train_step(config, tx, lr_fn, mesh)

    def args():
        return (params, tx.init(params), {"loss": jnp.float32(0)})

    def stepper(p, o, _m):
        return step(p, o, batch, se, 0.0)

    return drained_steps(stepper, args, label="FLAT per-shard (explicit path, G=1)")


def main():
    s = int(os.environ.get("BENCH_SCEN", "256"))
    fast_leg(s, f"FAST path, {s}-scen pack (shipped single-chip)")
    for sub in (64, 32):
        fast_leg(sub, f"FAST path, {sub}-scen sub-pack (windowed shard at G={s//sub})")
    flat_leg(s)


if __name__ == "__main__":
    main()
