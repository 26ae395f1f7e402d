"""Per-Pallas-kernel TRUE roofline of the train step (round-5 VERDICT #1).

Hand-counted FLOPs + HBM bytes for every Pallas kernel call in the step
(ops/cost_model — XLA's cost analysis charges custom calls zero), plus
the XLA remainder, against the device peaks. Prints a per-family table
with binding-resource attribution and the whole-step true floor, and —
when run on the real chip — the measured step time and pct_of_true_floor.

Usage: python tools/true_roofline.py [lanegcn|lanercnn] [--no-measure]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lanegcn_tpu.ops import cost_model


def build_lanegcn():
    from bench import bench_pack_config, make_batches
    from lanegcn_tpu.config import Config
    from lanegcn_tpu.models.lanegcn import LaneGCN
    from lanegcn_tpu.train.loop import make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer

    config = Config(pack=bench_pack_config())
    batches, stats, _ = make_batches(config, 2, config.pack.max_scenarios)
    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    step = make_train_step(config, net, tx, lr_fn)
    return step, params, opt_state, batches, stats[0]["_host_batch"]


def build_lanercnn():
    from bench_lanercnn import bench_roi_config
    from lanegcn_tpu.config import Config
    from lanegcn_tpu.data.dataset import RoiSyntheticDataset
    from lanegcn_tpu.data.packing_roi import pack_roi_batch
    from lanegcn_tpu.models.lanercnn import LaneRCNN, roi_loss, roi_metrics
    from lanegcn_tpu.train.loop import make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer

    scen = int(os.environ.get("BENCH_SCEN", "256"))
    config = Config(roi_pack=bench_roi_config(scen))
    ds = RoiSyntheticDataset(2 * scen, num_corridors=7, num_actors=12, urban=True)
    batches = []
    host_b0 = None
    for b in range(2):
        scens = [ds[b * scen + i] for i in range(scen)]
        batch, _ = pack_roi_batch(scens, config.roi_pack, config.model)
        if b == 0:
            host_b0 = batch
        batches.append(jax.tree.map(jnp.asarray, batch))
    net = LaneRCNN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    step = make_train_step(
        config, net, tx, lr_fn, loss_fn=roi_loss, metrics_fn=roi_metrics
    )
    return step, params, opt_state, batches, host_b0


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "lanegcn"
    measure = "--no-measure" not in sys.argv
    step, params, opt_state, batches, host_b0 = (
        build_lanegcn() if model == "lanegcn" else build_lanercnn()
    )

    with cost_model.recording() as recs:
        lowered = step.lower(params, opt_state, batches[0], 0.0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    kind = jax.devices()[0].device_kind
    fl = cost_model.step_floor(
        recs, host_b0, ca.get("bytes accessed", 0.0), ca.get("flops", 0.0), kind
    )
    dev = fl["device"]
    t = fl["totals"]

    print(f"== true roofline: {model} on {dev.name} "
          f"(BW {dev.hbm_bw/1e9:.0f} GB/s, MXU {dev.mxu_bf16/1e12:.1f} TMAC/s bf16) ==")
    print(f"{'family':<22} {'calls':>5} {'GB':>7} {'GMAC':>8} {'useful':>8} "
          f"{'infl':>6} {'t_bw ms':>8} {'t_mxu ms':>9} {'t_vpu ms':>9} "
          f"{'floor ms':>9} bind")
    for name, f in sorted(fl["families"].items(), key=lambda kv: -kv[1]["floor_ms"]):
        print(f"{name:<22} {f['calls']:>5} {f['hbm_bytes']/1e9:>7.2f} "
              f"{f['mxu_macs']/1e9:>8.1f} {f['useful_macs']/1e9:>8.1f} "
              f"{f['mac_inflation']:>6.1f} {f['t_bytes_ms']:>8.2f} "
              f"{f['t_mxu_ms']:>9.2f} {f['t_vpu_ms']:>9.2f} "
              f"{f['floor_ms']:>9.2f} {f['binding']}")
    print(f"{'XLA remainder':<22} {'':>5} {t['xla_bytes']/1e9:>7.2f} "
          f"{t['xla_flops']/2e9:>8.1f} {'':>8} {'':>6} "
          f"{1e3*t['xla_bytes']/dev.hbm_bw:>8.2f} "
          f"{1e3*t['xla_flops']/(2*dev.mxu_bf16):>9.2f} {'':>9} "
          f"{t['xla_floor_ms']:>9.2f}")
    print(f"\nwhole-step true floor: {t['true_floor_ms']:.1f} ms "
          f"(pallas {t['pallas_floor_ms']:.1f} + xla {t['xla_floor_ms']:.1f}); "
          f"pallas one-hot MAC inflation "
          f"{t['pallas_macs']/max(t['pallas_useful_macs'],1):.1f}x")

    missing = [c for c in fl["calls"] if not c.get("had_stats")
               and c["family"] in ("scenario_agg", "pair_agg", "win_edge",
                                   "window_scatter")]
    if missing:
        fams = sorted({c["family"] + ":" + c["phase"] for c in missing})
        print(f"WARNING: {len(missing)} plan-kernel calls lacked host "
              f"occupancy stats (used worst-case): {fams}")

    if measure:
        params2, opt2, m = step(params, opt_state, batches[0], 0.0)
        _ = float(m["loss"])
        iters = 30
        t0 = time.time()
        p, o = params2, opt2
        for i in range(iters):
            p, o, m = step(p, o, batches[i % 2], 0.0)
        _ = float(m["loss"])
        step_ms = 1e3 * (time.time() - t0) / iters
        print(f"measured step: {step_ms:.1f} ms → "
              f"{100.0*t['true_floor_ms']/step_ms:.1f}% of the true floor")


if __name__ == "__main__":
    main()
