"""Benchmark: LaneRCNN training throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference trains LaneRCNN at batch 10 and publishes no throughput, so
vs_baseline reuses the LaneGCN per-GPU baseline (58.8 scen/s, BASELINE.md) —
a conservative stand-in (LaneRCNN is the heavier model).

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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lanegcn_tpu.config import Config, RoiPackConfig
from lanegcn_tpu.data.dataset import RoiSyntheticDataset
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.lanercnn import LaneRCNN, roi_loss, roi_metrics
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer

BASELINE_SCEN_PER_S_PER_CHIP = 235.0 / 4.0


def bench_roi_config(scen: int = 512) -> RoiPackConfig:
    # Urban junction-rich graphs (round 2 — matches bench.py; the round-1
    # corridor numbers are not comparable). Measured at 256 scenarios
    # (7 corridors, 12 actors, urban=True): 1,357 RoIs, 93.9k RoI nodes,
    # 180.8k global nodes, 17.8k interest nodes, 936k pool edges each way,
    # 9k a2m, 43k a2r; the RoI edge lists carry a real cross-lane residue
    # at every dilation scale (674..6,122 per relation — the corridors had
    # zero). Capacities carry ~10% headroom; the pack asserts zero drops
    # below, so an overflow fails loudly rather than silently.
    f = scen // 256
    # Round 3: WINDOWED layouts + window edge plans (ops/pallas_scenario_agg)
    # for both node spaces — RoIs placed at RoI granularity into 256-row
    # windows (RoIs are ~70-150 nodes: dense fill, no straddle), the global
    # graph at scenario granularity into 768-row windows (bench.py's
    # layout). left/right ride the plans (table_relations=()).
    return RoiPackConfig(
        max_scenarios=scen,
        max_rois=1536 * f,
        max_roi_nodes=98304 * f,      # 256 x 384 windows (bin-packed ~97% fill)
        max_global_nodes=208896 * f,  # 768 x 272 windows (bench.py sizing)
        max_interest_nodes=20480 * f,
        node_stride=256,
        max_plan_edges=int(os.environ.get("BENCH_ROI_PLAN", "512")),
        global_node_stride=768,
        global_plan_edges=int(os.environ.get("BENCH_G_PLAN", "2048")),
        table_relations=(),
        # classic lists carry only the plan spill (~3.3k measured)
        max_edges_scale0=512 * f,
        max_edges_dilated=2048 * f,
        max_edges_lr=2048 * f,
        max_a2m_edges=10240 * f,
        max_pool_edges=int(os.environ.get("BENCH_POOL_CAP", 1048576 * f)),
        max_a2r_edges=49152 * f,
    )


def run_bench(scen: int | None = None, remat: bool | None = None) -> dict:
    """Measure the LaneRCNN train step (drained protocol); returns the
    result fields bench.py folds into its combined JSON (VERDICT r3 #3)."""
    scen = scen or int(os.environ.get("BENCH_SCEN", "256"))
    # remat of the pooling stages trades recompute for memory; at the
    # right-sized capacities the 256-scenario pack fits WITHOUT remat and
    # runs 16% faster (419 vs 486 ms) — default off, BENCH_REMAT=1 opts in.
    if remat is None:
        remat = os.environ.get("BENCH_REMAT", "0") == "1"
    config = Config(roi_pack=bench_roi_config(scen))
    num_batches = 2
    scen_per_batch = config.roi_pack.max_scenarios

    t0 = time.time()
    ds = RoiSyntheticDataset(
        num_batches * scen_per_batch, num_corridors=7, num_actors=12, urban=True
    )
    batches = []
    host_b0 = None
    all_drops: dict = {}
    for b in range(num_batches):
        scens = [ds[b * scen_per_batch + i] for i in range(scen_per_batch)]
        batch, stats = pack_roi_batch(scens, config.roi_pack, config.model)
        if b == 0:
            host_b0 = batch  # pre-transfer pack for the true-roofline accounting
        drops = {k: v for k, v in stats.items() if k.startswith("dropped") and v}
        assert stats["packed_scenarios"] == scen_per_batch, stats
        assert not drops, drops
        for k, v in drops.items():
            all_drops[k] = all_drops.get(k, 0) + v
        batches.append(jax.tree.map(jnp.asarray, batch))
    print(f"# packed {num_batches}x{scen_per_batch} scenarios ({time.time()-t0:.1f}s host)", file=sys.stderr)

    net = LaneRCNN(config.model, dtype=jnp.bfloat16, remat=remat)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    train_step = make_train_step(
        config, net, tx, lr_fn, loss_fn=roi_loss, metrics_fn=roi_metrics
    )

    from lanegcn_tpu.ops import cost_model

    t0 = time.time()
    # Recording wraps the FIRST call: kernel cost records fire at trace
    # time, and later .lower() calls reuse the cached jaxpr (no re-trace).
    with cost_model.recording() as kernel_recs:
        params, opt_state, m = train_step(params, opt_state, batches[0], 0.0)
    _ = float(m["loss"])  # value fetch: drains compile + execution
    compile_s = time.time() - t0
    print(f"# compile+first step: {compile_s:.1f}s", file=sys.stderr)

    # One drained step to estimate real step time, then size the window.
    t0 = time.time()
    params, opt_state, m = train_step(params, opt_state, batches[1 % num_batches], 0.0)
    est = max(time.time() - t0, 1e-4)
    iters = int(min(50, max(10, 20.0 / est)))

    t0 = time.time()
    for i in range(iters):
        params, opt_state, m = train_step(
            params, opt_state, batches[i % num_batches], 0.0
        )
    final_loss = float(m["loss"])  # inside the window: forces full drain
    dt = time.time() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    scen_per_s = scen_per_batch * iters / dt
    step_ms = dt / iters * 1e3
    print(
        f"# {iters} steps in {dt:.2f}s → {step_ms:.2f} ms/step, "
        f"{scen_per_s:.1f} scen/s (bf16 train fwd+bwd+adamw+metrics)",
        file=sys.stderr,
    )
    result = {
        "value": round(scen_per_s, 2),
        "unit": "scenarios/s",
        "vs_baseline": round(scen_per_s / BASELINE_SCEN_PER_S_PER_CHIP, 3),
        "step_ms": round(step_ms, 2),
        "compile_s": round(compile_s, 1),
        "dropped": all_drops,
    }
    # Bandwidth roofline for the RoI step (same method as bench.py), plus
    # the round-5 TRUE floor (hand-counted Pallas costs, ops/cost_model).
    try:
        lowered = train_step.lower(params, opt_state, batches[0], 0.0)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        byts = ca.get("bytes accessed", 0.0)
        flops = ca.get("flops", 0.0)
        kind = jax.devices()[0].device_kind
        from bench import PEAK_HBM_BW

        bw = next(
            (v for k, v in PEAK_HBM_BW.items() if k.lower() in kind.lower()),
            819e9,
        )
        if byts:
            floor = byts / bw
            pct = 100.0 * floor / (dt / iters)
            result["pct_of_bw_roofline"] = round(pct, 1)
            print(
                f"# roofline: {byts/1e9:.1f} GB/step → bw floor "
                f"{floor*1e3:.1f} ms vs measured {step_ms:.1f} ms = "
                f"{pct:.0f}%",
                file=sys.stderr,
            )
        fl = cost_model.step_floor(kernel_recs, host_b0, byts, flops, kind)
        true_floor = fl["totals"]["true_floor_ms"]
        result["true_floor_ms"] = round(true_floor, 1)
        result["pct_of_true_floor"] = round(100.0 * true_floor / step_ms, 1)
        print(
            f"# true floor: {true_floor:.1f} ms (xla "
            f"{fl['totals']['xla_floor_ms']:.1f} + pallas "
            f"{fl['totals']['pallas_floor_ms']:.1f}, {len(kernel_recs)} "
            f"kernel calls) vs measured {step_ms:.1f} ms = "
            f"{result['pct_of_true_floor']:.0f}%",
            file=sys.stderr,
        )
    except Exception as e:  # cost analysis is backend-dependent
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)
    return result


def main():
    r = run_bench()
    print(
        json.dumps(
            {
                "metric": "lanercnn_train_scenarios_per_sec_per_chip",
                **r,
            }
        )
    )


if __name__ == "__main__":
    main()
