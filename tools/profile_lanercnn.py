"""Component-level drained timing of the LaneRCNN train step at bench shapes.

Usage: python tools/profile_lanercnn.py [step fwd parts]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench_lanercnn import bench_roi_config
from lanegcn_tpu.config import Config
from lanegcn_tpu.data.dataset import RoiSyntheticDataset
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.lanercnn import (
    Decode, Interactor, LaneInput, LanePooling, LaneRCNN, LaneRoI, roi_loss, roi_metrics,
)
from lanegcn_tpu.train.loop import make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer


def timed(name, fn, *args, iters=10, grad_wrt=None):
    if grad_wrt is not None:
        f0 = fn
        fn = jax.grad(
            lambda *a: jnp.sum(
                jnp.asarray(jax.tree.leaves(f0(*a))[0]).astype(jnp.float32) ** 2
            ),
            argnums=grad_wrt,
        )
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name:36s} {(time.time()-t0)/iters*1e3:8.2f} ms", flush=True)


def main():
    want = set(sys.argv[1:]) or {"step", "fwd", "parts"}
    config = Config(roi_pack=bench_roi_config(256))
    ds = RoiSyntheticDataset(256, num_corridors=3, num_actors=12)
    scens = [ds[i] for i in range(256)]
    t0 = time.time()
    batch, stats = pack_roi_batch(scens, config.roi_pack, config.model)
    batch = jax.tree.map(jnp.asarray, batch)
    print(f"# packed in {time.time()-t0:.1f}s", flush=True)

    net = LaneRCNN(config.model, dtype=jnp.bfloat16, remat=False)
    params = net.init(jax.random.PRNGKey(0), batch)["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)

    if "step" in want:
        step = make_train_step(config, net, tx, lr_fn, loss_fn=roi_loss, metrics_fn=roi_metrics)
        p, o, m = step(params, opt_state, batch, 0.0)
        _ = float(m["loss"])
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            p, o, m = step(p, o, batch, 0.0)
        _ = float(m["loss"])
        print(f"{'full train step':36s} {(time.time()-t0)/iters*1e3:8.2f} ms", flush=True)

    if "fwd" in want:
        timed("forward", lambda p, b: net.apply({"params": p}, b), params, batch)

    if "parts" in want:
        n_map = config.model.n_map
        m_nodes = batch.node_feats.shape[0]
        feat = jnp.zeros((m_nodes, n_map), jnp.bfloat16)

        li = LaneInput(config.model, dtype=jnp.bfloat16)
        lp = li.init(jax.random.PRNGKey(0), batch)["params"]
        timed("LaneInput fwd", lambda p, b: li.apply({"params": p}, b), lp, batch)

        lr = LaneRoI(config.model, dtype=jnp.bfloat16)
        lrp = lr.init(jax.random.PRNGKey(0), feat, batch.edges, batch.bands)["params"]
        timed("LaneRoI fwd", lambda p, f: lr.apply({"params": p}, f, batch.edges, batch.bands), lrp, feat)
        timed(
            "LaneRoI fwd+bwd(x)",
            lambda p, f: lr.apply({"params": p}, f, batch.edges, batch.bands),
            lrp, feat, grad_wrt=1,
        )

        it = Interactor(config.model, dtype=jnp.bfloat16, remat=False)
        itp = it.init(jax.random.PRNGKey(0), batch, feat)["params"]
        timed("Interactor fwd", lambda p, f: it.apply({"params": p}, batch, f), itp, feat)
        timed(
            "Interactor fwd+bwd(x)",
            lambda p, f: it.apply({"params": p}, batch, f),
            itp, feat, grad_wrt=1,
        )

        dc = Decode(config.model, dtype=jnp.bfloat16, remat=False)
        dcp = dc.init(jax.random.PRNGKey(0), feat, batch)["params"]
        timed("Decode fwd", lambda p, f: dc.apply({"params": p}, f, batch), dcp, feat)
        timed(
            "Decode fwd+bwd(x)",
            lambda p, f: dc.apply({"params": p}, f, batch),
            dcp, feat, grad_wrt=1,
        )


if __name__ == "__main__":
    main()
