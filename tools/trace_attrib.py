"""Per-module time attribution of the train step on the real chip.

Captures a jax.profiler trace of N train steps, joins the device op events
with the compiled HLO's op_name metadata (module path + fwd/bwd +
operation), and prints where the step time actually goes — the tool that
found round 3's ~90 ms of scatter-shaped work (docs/PERFORMANCE.md).

Usage: python tools/trace_attrib.py [iters]
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

MODULES = ("map_net", "m2m", "a2m", "m2a", "a2a", "actor_net", "pred_net",
           "input", "roi_net1", "roi_net2", "interactor", "decode")


def attribute(trace_path: str, hlo_text: str, iters: float, top: int = 30):
    meta = {}
    for m in re.finditer(r'%([\w.\-]+) = [^\n]*?op_name="([^"]+)"', hlo_text):
        meta[m.group(1)] = m.group(2)
    # Pallas custom-calls carry the kernel module in their source_file
    # metadata — bucket device time per kernel FAMILY (round-5 VERDICT #2:
    # per-kernel measured time to set against the cost-model floors).
    kern = {}
    for m in re.finditer(
        r'%([\w.\-]+) = [^\n]*?custom_call_target="tpu_custom_call"'
        r'[^\n]*?source_file="([^"]+)"', hlo_text,
    ):
        fam = m.group(2).rsplit("/", 1)[-1].replace("pallas_", "").replace(".py", "")
        kern[m.group(1)] = fam
    data = json.load(gzip.open(trace_path))
    events = data["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    ops = [e for e in events if e.get("ph") == "X" and "dur" in e
           and "TPU" in pids.get(e.get("pid"), "")
           and not e["name"].startswith("jit_")
           and not re.fullmatch(r"\d+", e["name"])]
    by_mod = defaultdict(float)
    by_site = defaultdict(float)
    by_kernel = defaultdict(float)
    for e in ops:
        op = meta.get(e["name"])
        d = e["dur"]
        fam = kern.get(e["name"])
        if fam is not None:
            pre = "bwd:" if (op and "transpose" in op) else "fwd:"
            by_kernel[pre + fam] += d
        if op is None:
            by_mod["<unattributed:" + re.sub(r"[.\d]+$", "", e["name"]) + ">"] += d
            continue
        parts = op.split("/")
        pre = "bwd:" if "transpose" in op else "fwd:"
        mod = next((p for p in parts if p in MODULES), parts[1] if len(parts) > 1 else op)
        by_mod[pre + mod] += d
        by_site[pre + mod + "/" + re.sub(r"[.\d]+$", "", parts[-1])] += d
    total = sum(by_mod.values())
    print(f"attributed device time: {total/1e3/iters:.1f} ms/iter")
    for k, v in sorted(by_mod.items(), key=lambda kv: -kv[1]):
        if v / 1e3 / iters > 0.3:
            print(f"  {v/1e3/iters:7.2f} ms  {k}")
    if by_kernel:
        print("\n-- pallas kernel families (measured device ms/iter) --")
        for k, v in sorted(by_kernel.items(), key=lambda kv: -kv[1]):
            print(f"  {v/1e3/iters:7.2f} ms  {k}")
    print("\n-- top op sites --")
    for k, v in sorted(by_site.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {v/1e3/iters:7.2f} ms  {k}")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bench import bench_pack_config, make_batches
    from lanegcn_tpu.config import Config
    from lanegcn_tpu.models.lanegcn import LaneGCN
    from lanegcn_tpu.train.loop import make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer

    config = Config(pack=bench_pack_config())
    batches, _, _ = make_batches(config, 2, config.pack.max_scenarios)
    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    step = make_train_step(config, net, tx, lr_fn)
    params, opt_state, m = step(params, opt_state, batches[0], 0.0)
    _ = float(m["loss"])
    t0 = time.time()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, batches[i % 2], 0.0)
    _ = float(m["loss"])
    print(f"drained wall: {(time.time()-t0)/iters*1e3:.1f} ms/step")

    trace_dir = "/tmp/lanegcn_trace"
    jax.profiler.start_trace(trace_dir)
    for i in range(iters):
        params, opt_state, m = step(params, opt_state, batches[i % 2], 0.0)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    hlo = step.lower(params, opt_state, batches[0], 0.0).compile().as_text()
    import glob

    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    attribute(traces[-1], hlo, float(iters))


if __name__ == "__main__":
    main()
