"""HBM-bandwidth roofline for the shipped urban train step.

The dense-MFU number is non-judging for this workload (gather/scatter
bound); the roofline that binds is HBM traffic. This tool reports:
- compiled-program bytes/step from XLA's cost analysis (post-fusion HLO:
  each fusion counts only its operands + outputs, so this approximates the
  traffic the program actually issues to HBM),
- the bandwidth-bound floor time = bytes / peak HBM BW,
- measured step time and pct_of_bw_roofline = floor / measured.

Shares bench.py's pack config and drained-measurement protocol.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

# Peak HBM bandwidth by device kind (public figures, bytes/s).
PEAK_HBM_BW = {
    "TPU v4": 1228e9,
    "TPU v5e": 819e9,
    "TPU v5 lite": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6e": 1638e9,
    "cpu": 50e9,
}


def device_hbm_bw() -> float:
    kind = jax.devices()[0].device_kind
    return next(
        (v for k, v in PEAK_HBM_BW.items() if k.lower() in kind.lower()), 819e9
    )


def cost_breakdown(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca


def main():
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
    train_step = make_train_step(config, net, tx, lr_fn)

    lowered = train_step.lower(params, opt_state, batches[0], 0.0)
    compiled = lowered.compile()
    ca = cost_breakdown(compiled)
    for k in sorted(ca):
        if "bytes" in k or k in ("flops", "transcendentals", "optimal_seconds"):
            print(f"# cost[{k!r}] = {ca[k]:.3e}", file=sys.stderr)

    params, opt_state, m = train_step(params, opt_state, batches[0], 0.0)
    _ = float(m["loss"])
    t0 = time.time()
    iters = 50
    for i in range(iters):
        params, opt_state, m = train_step(params, opt_state, batches[i % 2], 0.0)
    _ = float(m["loss"])
    step_t = (time.time() - t0) / iters
    bw = device_hbm_bw()
    byts = ca.get("bytes accessed", 0.0)
    floor = byts / bw
    print(
        f"step {step_t*1e3:.1f} ms; bytes/step {byts/1e9:.2f} GB; "
        f"bw floor {floor*1e3:.1f} ms @ {bw/1e9:.0f} GB/s; "
        f"pct_of_bw_roofline {100*floor/step_t:.1f}%"
    )


if __name__ == "__main__":
    main()
