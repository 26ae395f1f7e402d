"""Host packing cost isolation: portable ms/scenario per stage.

The sustained e2e rate is min(host, device); on this 2-core box the host
side binds, so this tool isolates where packing time goes — a portable
per-scenario cost that predicts e2e on production hosts (VERDICT #4).

Stages measured (pack caches warm, as when reading preprocessed shards):
  fetch      dataset __getitem__ (cache hit)
  cache      precompute_pack_cache cold (the preprocess CLI bakes this)
  pack_flat  pack_batch with bands/tables/plan off (concat + edge reorder)
  pack_full  shipped config (bands + window plan + spill)
  partition  explicit graph-parallel edge partition (the --mesh DxG path)
  transfer   host → device (run on TPU; skipped on cpu)

Also measures PackedLoader worker scaling (pack_workers 1/2/4).

Usage: BENCH_PLATFORM=cpu python tools/bench_pack.py [n_scen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from bench import bench_pack_config
from lanegcn_tpu.config import Config
from lanegcn_tpu.data import pack_batch
from lanegcn_tpu.data.packing import precompute_pack_cache
from lanegcn_tpu.data.synthetic import make_urban_scenario


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = Config(pack=bench_pack_config(n))
    mcfg = config.model

    t0 = time.time()
    scens = [
        make_urban_scenario(seed=i, num_corridors=7, num_actors=16)
        for i in range(n)
    ]
    print(f"gen: {(time.time()-t0)/n*1e3:.2f} ms/scen (synthetic only — real "
          f"data reads shards instead)")

    t0 = time.time()
    for s in scens:
        precompute_pack_cache(s, mcfg)
    print(f"cache (cold, offline in preprocess): {(time.time()-t0)/n*1e3:.2f} ms/scen")

    def timed(name, fn, iters=5):
        fn()  # warm
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        dt = (time.time() - t0) / iters
        print(f"{name:36s} {dt*1e3:8.1f} ms/pack  {dt/n*1e3:6.3f} ms/scen")
        return out

    timed("fetch (cache hit)", lambda: [scens[i] for i in range(n)])
    timed(
        "pack_flat (concat+reorder only)",
        lambda: pack_batch(scens, config.pack, mcfg, split_bands=False,
                           split_tables=False, scenario_plan=False),
    )
    batch = timed(
        "pack_full (shipped: bands+plan)",
        lambda: pack_batch(scens, config.pack, mcfg),
    )[0]

    from lanegcn_tpu.parallel import partition_pack_edges

    flat = pack_batch(scens, config.pack, mcfg, split_bands=False,
                      split_tables=False, scenario_plan=False)[0]
    timed(
        "partition (explicit GP, G=4)",
        lambda: partition_pack_edges(flat, config, 4),
    )

    if jax.default_backend() != "cpu":
        def xfer():
            out = jax.tree.map(jnp.asarray, batch)
            jax.block_until_ready(out)
            return out
        timed("transfer host->device", xfer, iters=3)

    # loader worker scaling
    from lanegcn_tpu.data.dataset import PackedLoader

    class _List:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    big = _List(scens * 4)  # 4 packs worth
    for w in (1, 2, 4):
        loader = PackedLoader(big, config, shuffle=False, pack_workers=w)
        list(loader.epoch(0))  # warm
        t0 = time.time()
        cnt = sum(1 for _ in loader.epoch(0))
        dt = time.time() - t0
        print(f"loader pack_workers={w}: {cnt} packs in {dt:.2f}s → "
              f"{cnt*n/dt:.0f} scen/s host-side ({os.cpu_count()} cpus)")


if __name__ == "__main__":
    main()
