"""Benchmark: LaneGCN training throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains 205,942 scenarios/epoch in ~870 s on 4× RTX
5000 ≈ 235 scen/s aggregate ≈ 58.8 scen/s per GPU (BASELINE.md). value =
scenarios/s through the full jitted train step (fwd+bwd+Adam) on one chip;
vs_baseline = value / 58.8.

Measurement protocol: the axon relay executes asynchronously and
`jax.block_until_ready` can return before the device has actually executed
the queued programs (measured: a fresh process "ran" 100 steps in 0.2 s —
a 3.7 PFLOP/s dispatch rate, 19× the chip's peak). Every timed window here
therefore ends with a VALUE fetch (`float(metrics["loss"])`) of a scalar
that data-depends on every timed step, which forces a full pipeline drain.

Run alone — the axon TPU tunnel admits one process at a time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the scanned multi-step program is expensive to
# compile; repeated bench runs reuse it.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lanegcn_tpu.config import Config, PackConfig, TrainConfig, relation_names
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer

BASELINE_SCEN_PER_S_PER_CHIP = 235.0 / 4.0  # reference: 4× RTX 5000 aggregate


def bench_pack_config(num_scen: int | None = None) -> PackConfig:
    # Packs of BENCH_SCEN scenarios at realistic sizes (~310 lane nodes, ~12
    # actors per scenario; capacities scale per-scenario). With band
    # splitting every intra-lane pre/suc edge lives in the [N] band masks,
    # and with table splitting every left/right edge (and the first
    # cross-lane pre/suc edge per destination) lives in the [N] neighbor
    # tables — the edge lists hold only duplicate-destination overflow (zero
    # on these synthetic corridors; capacity kept nonzero so the residual
    # scatter path stays in the measured program).
    s = num_scen or int(os.environ.get("BENCH_SCEN", "256"))
    return PackConfig(
        max_scenarios=s,
        max_actors=16 * s,
        max_nodes=320 * s,
        max_edges_scale0=max(4 * s, 512),
        max_edges_dilated=max(4 * s, 512),
        max_edges_lr=max(4 * s, 512),
        max_a2m_edges=128 * s,
        max_m2a_edges=128 * s,
        max_a2a_edges=128 * s,
        # ~305 tabled left/right edges per scenario measured; 384/s leaves
        # 25% headroom (the backward's sorted transpose scatter processes
        # capacity, not valid count — the 2×max_nodes auto default wastes 2x)
        max_table_edges=384 * s,
    )


def make_batches(config: Config, num_batches: int, scen_per_batch: int):
    batches = []
    all_stats = []
    seed = 0
    for b in range(num_batches):
        scens = [
            make_synthetic_scenario(seed=seed + i, num_corridors=3, num_actors=12)
            for i in range(scen_per_batch)
        ]
        seed += scen_per_batch
        batch, stats = pack_batch(scens, config.pack, config.model)
        batches.append(jax.tree.map(jnp.asarray, batch))
        all_stats.append(stats)
    return batches, all_stats


def count_edges(batch) -> int:
    """Total valid message-passing edges per step (LaneConv + fusion),
    including banded intra-lane edges carried by the band masks and
    left/right edges carried by the neighbor tables."""
    n = 0
    n_cap = batch.graph.ctrs.shape[0]
    for e in batch.graph.edges.values():
        n += int(jnp.sum(e.mask))
    if batch.graph.bands is not None:
        for m in batch.graph.bands.values():
            n += int(jnp.sum(m))
    if batch.graph.tables is not None:
        for t in batch.graph.tables.values():
            n += int(jnp.sum(t < n_cap))
    for e in (batch.fusion.a2m, batch.fusion.m2a, batch.fusion.a2a):
        n += int(jnp.sum(e.mask))
    return n


def main():
    config = Config(pack=bench_pack_config())
    num_batches = 2
    scen_per_batch = config.pack.max_scenarios

    t0 = time.time()
    batches, stats = make_batches(config, num_batches, scen_per_batch)
    drops = {
        k: sum(s.get(k, 0) for s in stats)
        for k in stats[0]
        if k.startswith("dropped") and sum(s.get(k, 0) for s in stats)
    }
    packed = sum(s["packed_scenarios"] for s in stats)
    print(
        f"# packed {packed} scenarios into {num_batches} packs "
        f"({time.time() - t0:.1f}s host); drops={drops}",
        file=sys.stderr,
    )

    # bf16 compute (params/normalization fp32): the production TPU config —
    # 3.4x over fp32 at this size; convergence parity covered by
    # tests/test_training.py::test_small_model_overfits_bf16.
    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)

    train_step = make_train_step(config, net, tx, lr_fn)

    t0 = time.time()
    params, opt_state, m = train_step(params, opt_state, batches[0], 0.0)
    first_loss = float(m["loss"])  # value fetch: drains compile + execution
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    # One drained step to estimate the real step time, then size the
    # measured window to ~20 s.
    t0 = time.time()
    params, opt_state, m = train_step(params, opt_state, batches[1 % num_batches], 0.0)
    est = max(time.time() - t0, 1e-4)
    iters = int(min(100, max(10, 20.0 / est)))

    t0 = time.time()
    for i in range(iters):
        params, opt_state, m = train_step(
            params, opt_state, batches[i % num_batches], 0.0
        )
    final_loss = float(m["loss"])  # inside the window: forces full drain
    dt = time.time() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    scen_per_s = scen_per_batch * iters / dt
    edges = count_edges(batches[0])
    edges_per_s = edges * iters / dt
    print(
        f"# {iters} steps in {dt:.2f}s → {scen_per_s:.1f} scen/s, "
        f"{edges_per_s/1e6:.1f}M msg-edges/s (bf16 train fwd+bwd+adam+metrics)",
        file=sys.stderr,
    )
    # Optional: inference throughput (reference val pass: 39,472 scen in
    # ~59-70 s on 4 GPUs ≈ 600 scen/s aggregate — misc/train_log.txt).
    # Off by default: the eval program compiles slowly on this backend and
    # the driver's bench run must stay fast.
    if os.environ.get("BENCH_INFER") == "1":
        from lanegcn_tpu.train.loop import make_eval_step

        eval_step = make_eval_step(config, net)
        out, m = eval_step(params, batches[0])
        _ = float(m["loss"])
        t0 = time.time()
        for i in range(iters):
            out, m = eval_step(params, batches[i % num_batches])
        _ = float(m["loss"])  # drain
        infer_per_s = scen_per_batch * iters / (time.time() - t0)
        print(f"# inference: {infer_per_s:.0f} scen/s (bf16 fwd+loss+metrics)", file=sys.stderr)

    # Optional: sustained end-to-end throughput — PackedLoader (background
    # host packing over pack-cached scenarios, as when reading preprocessed
    # shards) feeding the jitted train step. Bounded by min(host, device);
    # host packing scales with cores (this box has 2). Measured components
    # per 1024-scenario pack: pack 58 ms, h2d transfer 22 ms (median; the
    # axon tunnel spikes to 0.5-1 s at ~25% rate — a relay artifact, PCIe
    # DMA on a real TPU host moves 38 MB in ~5 ms), step dispatch 3 ms →
    # 8-15k scen/s sustained here, transfer-bound, not pipeline-bound.
    if os.environ.get("BENCH_E2E") == "1":
        from lanegcn_tpu.data.dataset import PackedLoader

        n_scen = 2 * scen_per_batch
        scens = [
            make_synthetic_scenario(seed=10_000 + i, num_corridors=3, num_actors=12)
            for i in range(n_scen)
        ]
        from lanegcn_tpu.data.packing import precompute_pack_cache

        for s in scens:
            precompute_pack_cache(s, config.model)  # shards carry these

        class _ListDataset:
            def __init__(self, items):
                self.items = items

            def __len__(self):
                return len(self.items)

            def __getitem__(self, i):
                return self.items[i]

        # pack_workers=1 on this 2-core box: the single background
        # packing thread overlaps with the transfer thread; more workers
        # just contend for the 2 CPUs (measured: w=2 is ~2x slower).
        loader = PackedLoader(
            _ListDataset(scens), config, shuffle=True, pack_workers=1
        )
        # Warm epoch (fills page cache, compiles nothing new), then measure.
        for ep in range(3):
            t0 = time.time()
            n = 0
            for b in loader.epoch(ep):
                b = jax.tree.map(jnp.asarray, b)
                params, opt_state, m = train_step(params, opt_state, b, 0.0)
                n += scen_per_batch
            _ = float(m["loss"])  # drain
            dt = time.time() - t0
            print(
                f"# e2e epoch {ep}: {n} scen in {dt:.2f}s → {n/dt:.0f} scen/s "
                f"(loader+pack+transfer+train, 1 pack worker)",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "train_scenarios_per_sec_per_chip",
                "value": round(scen_per_s, 2),
                "unit": "scenarios/s",
                "vs_baseline": round(scen_per_s / BASELINE_SCEN_PER_S_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
