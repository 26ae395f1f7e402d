"""Attribute the e2e-vs-device-rate gap: transfer/compute interleaving.

Three measurements on the same jitted train step (drained protocol):
  A. resident: steps over 2 device-resident packs — the device rate.
  B. +discard transfers: a worker thread performs device_put_blob of a
     fresh host pack at ~pack cadence, results DISCARDED (steps still
     consume resident packs). Any slowdown vs A is the relay's
     transfer-with-compute serialization penalty — nothing else changed.
  C. +consumed transfers: steps consume the freshly transferred packs
     (the real e2e structure minus host packing, which runs ahead).

On a production TPU host with async DMA, B ≈ A. On the axon relay the
B−A delta is the term that bounds e2e below the device rate regardless
of host packing speed (round-5 VERDICT #3: the residual is NOT host core
count — host packing measures 0.30 ms/scenario single-core, and the
loader-wait term is ~110 ms/pack vs walls of 380-640 ms/pack).
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config
from lanegcn_tpu.data import pack_batch
from lanegcn_tpu.data.blob import device_put_blob
from lanegcn_tpu.data.synthetic import make_urban_scenario
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    config = Config(pack=bench_pack_config())
    batches, stats, scens = make_batches(config, 2, config.pack.max_scenarios)
    host_pack, _ = pack_batch(
        scens[: config.pack.max_scenarios], config.pack, config.model
    )
    net = LaneGCN(config.model, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), batches[0])["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    step = make_train_step(config, net, tx, lr_fn)

    params, opt_state, m = step(params, opt_state, batches[0], 0.0)
    _ = float(m["loss"])

    def run(label, feed=None, inject=False):
        nonlocal params, opt_state
        stop = threading.Event()
        n_injected = [0]

        def injector():
            while not stop.is_set():
                t0 = time.time()
                b = device_put_blob(host_pack)
                if feed is not None:
                    feed.append(b)
                n_injected[0] += 1
                # pace at roughly one pack per step
                dt = time.time() - t0
                if dt < 0.13:
                    stop.wait(0.13 - dt)

        th = None
        if inject:
            th = threading.Thread(target=injector, daemon=True)
            th.start()
        t0 = time.time()
        for i in range(iters):
            if feed is not None:
                while not feed:
                    time.sleep(0.001)
                b = feed.pop(0)
            else:
                b = batches[i % 2]
            p2 = step(params, opt_state, b, 0.0)
            params, opt_state, m = p2
        _ = float(m["loss"])
        dt = time.time() - t0
        if th is not None:
            stop.set()
            th.join()
        print(f"{label}: {1e3 * dt / iters:.1f} ms/step "
              f"({iters} steps, {n_injected[0]} concurrent transfers)")
        return dt / iters

    a = run("A resident packs            ")
    b = run("B + discarded transfers     ", inject=True)
    feed: list = []
    c = run("C + consumed transfers (e2e)", feed=feed, inject=True)
    print(f"interleave penalty (B−A): {1e3 * (b - a):.1f} ms/step; "
          f"consumption penalty (C−B): {1e3 * (c - b):.1f} ms/step")

    # D: consume fresh batches as BLOBS unpacked inside the step — each
    # call passes ~3 argument handles instead of ~90.
    from lanegcn_tpu.data.blob import blob_step, device_put_blobs, pack_blobs

    nonlocal_params = [params, opt_state]
    _, meta = pack_blobs(host_pack)
    bstep = blob_step(step, meta)
    p, o = nonlocal_params
    blobs0, _ = device_put_blobs(host_pack)
    p, o, m = bstep(p, o, blobs0, 0.0)
    _ = float(m["loss"])
    stop = threading.Event()
    feed2: list = []

    def injector2():
        while not stop.is_set():
            t0 = time.time()
            feed2.append(device_put_blobs(host_pack)[0])
            dt = time.time() - t0
            if dt < 0.13:
                stop.wait(0.13 - dt)

    th = threading.Thread(target=injector2, daemon=True)
    th.start()
    t0 = time.time()
    for i in range(iters):
        while not feed2:
            time.sleep(0.001)
        p, o, m = bstep(p, o, feed2.pop(0), 0.0)
    _ = float(m["loss"])
    d = (time.time() - t0) / iters
    stop.set()
    th.join()
    print(f"D consumed BLOB transfers   : {1e3 * d:.1f} ms/step "
          f"(unpack inside the jitted step)")


if __name__ == "__main__":
    main()
