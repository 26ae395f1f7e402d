"""Scaling-efficiency harness: weak-scaling of the data-parallel train step
over an N-device mesh (SURVEY.md §7 build plan, config #5).

On a real pod this measures ICI-collective scaling of the XLA-inserted
gradient psum; on this box it runs the identical SPMD program on N virtual
CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count), which
validates the sharded program end-to-end but reports host-CPU numbers —
with only 2 physical cores, virtual-device weak efficiency is bounded by
2/N and says nothing about ICI. Run with SCALING_DEVICES=1,2,4,8 (default)
and SCALING_ITERS to choose points.

Prints one JSON line per mesh size:
  {"devices": N, "scen_per_s": ..., "weak_efficiency": ...}
weak_efficiency = (throughput at N) / (N × throughput at 1) — each device
always carries one full pack (weak scaling).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

DEVICES = [int(x) for x in os.environ.get("SCALING_DEVICES", "1,2,4").split(",")]

if os.environ.get("JAX_PLATFORMS", "") != "tpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(DEVICES)}"
        ).strip()

import jax

if os.environ.get("JAX_PLATFORMS", "") != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lanegcn_tpu.config import Config, PackConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import make_mesh, make_parallel_train_step, stack_packs
from lanegcn_tpu.train.optimizer import make_optimizer


def scaling_pack_config() -> PackConfig:
    # Small packs so the harness runs on CPU in minutes; on a pod raise to
    # bench.py's 1024-scenario sizes.
    return PackConfig(
        max_scenarios=4,
        max_actors=128,
        max_nodes=4096,
        max_edges_scale0=4096,
        max_edges_dilated=4096,
        max_edges_lr=2048,
        max_a2m_edges=4096,
        max_m2a_edges=4096,
        max_a2a_edges=2048,
    )


def main() -> None:
    config = Config(pack=scaling_pack_config())
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)
    scen_per_pack = config.pack.max_scenarios

    packs = []
    for d in range(max(DEVICES)):
        scens = [
            make_synthetic_scenario(seed=97 * d + i, num_corridors=1, num_actors=6)
            for i in range(scen_per_pack)
        ]
        b, stats = pack_batch(scens, config.pack, config.model)
        assert stats["packed_scenarios"] == scen_per_pack, stats
        packs.append(b)

    base_rate = None
    for n in DEVICES:
        devices = jax.devices()[:n]
        if len(devices) < n:
            print(f"# skipping n={n}: only {len(devices)} devices", file=sys.stderr)
            continue
        mesh = make_mesh(devices)
        batch = stack_packs(packs[:n])
        sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
        params = net.init(jax.random.PRNGKey(0), sample)["params"]
        opt_state = tx.init(params)
        step = make_parallel_train_step(config, net, tx, lr_fn, mesh)

        params, opt_state, m = step(params, opt_state, batch, 0.0)
        _ = float(m["loss"])  # value fetch: compile + first step, drained

        iters = int(os.environ.get("SCALING_ITERS", "5"))
        t0 = time.time()
        for _ in range(iters):
            params, opt_state, m = step(params, opt_state, batch, 0.0)
        _ = float(m["loss"])  # inside the window: forces full drain
        dt = (time.time() - t0) / iters
        rate = n * scen_per_pack / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the first point
        eff = rate / (n * base_rate)
        assert np.isfinite(float(m["loss"]))
        print(
            json.dumps(
                {
                    "devices": n,
                    "scen_per_s": round(rate, 2),
                    "step_ms": round(dt * 1e3, 2),
                    "weak_efficiency": round(eff, 4),
                }
            )
        )


if __name__ == "__main__":
    main()
