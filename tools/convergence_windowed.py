"""Convergence on the PRODUCTION multi-chip path (round-5 VERDICT #7).

Trains the scaled reference recipe through make_windowed_parallel_train_step
on a virtual (data=1 x graph=8) CPU mesh — balanced scenario-aligned
sub-packs, the `--mesh DxG` production default — and, from the SAME initial
weights on the SAME batch order, through the single-device step on the
union packs. The windowed step was proven equal for one SGD step
(tests/test_windowed_parallel.py); this proves it for a RUN: per-epoch
train-loss curves and final held-out ADE/FDE for both paths, plus full
drop accounting (every sub-pack must pack clean).

Usage:
  python tools/convergence_windowed.py --out docs/convergence_r05_windowed.json \
      [--epochs 12] [--lr-drop 10] [--train 128] [--val 24] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

G = 8  # graph axis of the virtual mesh


def pack_cfg(batch: int):
    from lanegcn_tpu.config import PackConfig

    # Windowed layout (node_stride) so subdivide_pack_config applies; caps
    # sized for 2-corridor synthetic scenarios (~330 nodes each) with
    # headroom at 1/G after balancing.
    return PackConfig(
        max_scenarios=batch,
        max_actors=8 * batch,
        max_nodes=256 * 4 * batch,  # ~2 windows/scenario + first-fit slack
        node_stride=256,
        max_plan_edges=1024,
        table_relations=(),
        max_edges_scale0=1024 * batch,
        max_edges_dilated=1024 * batch,
        max_edges_lr=256 * batch,
        max_a2m_edges=4096 * batch,
        max_m2a_edges=4096 * batch,
        max_a2a_edges=512 * batch,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lr-drop", type=float, default=10.0)
    ap.add_argument("--train", type=int, default=128)
    ap.add_argument("--val", type=int, default=24)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/convergence_r05_windowed.json")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS", "")
    from jax._src import xla_bridge

    if not xla_bridge.backends_are_initialized():
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

    import dataclasses

    from lanegcn_tpu.config import Config, TrainConfig
    from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.parallel import make_mesh_2d
    from lanegcn_tpu.parallel.windowed_parallel import (
        balance_scenarios,
        make_windowed_parallel_train_step,
        subdivide_pack_config,
    )
    from lanegcn_tpu.train.loop import MetricAccumulator, make_eval_step, make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer

    assert len(jax.devices()) >= G, jax.devices()
    mesh = make_mesh_2d(jax.devices()[:G], data=1, graph=G)

    cfg = Config(
        pack=pack_cfg(args.batch),
        train=TrainConfig(
            num_epochs=args.epochs, lr=(1e-3, 1e-4),
            lr_epochs=(args.lr_drop,), batch_size=args.batch, seed=args.seed,
        ),
    )
    bundle = get_model("lanegcn", cfg)
    cfg = bundle.config
    sub_cfg = subdivide_pack_config(cfg.pack, G)

    rng = np.random.default_rng(args.seed)
    scens = [
        make_synthetic_scenario(seed=1000 + i, num_corridors=2, num_actors=6)
        for i in range(args.train)
    ]
    val_scens = [
        make_synthetic_scenario(seed=9000 + i, num_corridors=2, num_actors=6)
        for i in range(args.val)
    ]

    def pack_union(group):
        b, st = pack_batch(group, cfg.pack, cfg.model)
        drops = {k: v for k, v in st.items() if k.startswith("dropped") and np.any(v)}
        assert not drops, drops
        return jax.tree.map(jnp.asarray, b)

    def pack_windowed(group):
        groups = balance_scenarios(group, G, max_per_group=sub_cfg.max_scenarios)
        subs = []
        for gi in groups:
            sb, st = pack_batch([group[i] for i in gi], sub_cfg, cfg.model)
            drops = {k: v for k, v in st.items()
                     if k.startswith("dropped") and np.any(v)}
            assert not drops, drops
            subs.append(sb)
        stacked = jax.tree.map(lambda *x: np.stack(x), *subs)
        return jax.tree.map(lambda x: jnp.asarray(x[None]), stacked)  # [1, G, ...]

    tx, lr_fn = make_optimizer(cfg.train)
    single_step = make_train_step(
        cfg, bundle.net, tx, lr_fn, loss_fn=bundle.loss_fn,
        metrics_fn=bundle.metrics_fn,
    )
    win_step = make_windowed_parallel_train_step(cfg, tx, lr_fn, mesh)

    first_union = pack_union(scens[: args.batch])
    params0 = bundle.net.init(jax.random.PRNGKey(args.seed), first_union)["params"]

    eval_step = make_eval_step(
        cfg, bundle.net, loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn
    )
    val_batches = [
        pack_union(val_scens[i : i + args.batch])
        for i in range(0, len(val_scens), args.batch)
    ]

    def validate(params):
        acc = MetricAccumulator()
        for vb in val_batches:
            _, m = eval_step(params, vb)
            acc.update(m)
        s = acc.summary()
        return {k: float(s[k]) for k in ("loss", "ade1", "fde1", "ade", "fde")}

    sides = {
        "single": {"params": params0, "opt": tx.init(params0), "loss": []},
        "windowed": {"params": params0, "opt": tx.init(params0), "loss": []},
    }
    t0 = time.time()
    order_rng = np.random.default_rng(args.seed + 1)
    for ep in range(args.epochs):
        order = order_rng.permutation(len(scens))
        ep_loss = {"single": [], "windowed": []}
        for i in range(0, len(order) - args.batch + 1, args.batch):
            group = [scens[j] for j in order[i : i + args.batch]]
            epoch_f = ep + i / len(order)
            ub = pack_union(group)
            wb = pack_windowed(group)
            s = sides["single"]
            s["params"], s["opt"], m1 = single_step(
                s["params"], s["opt"], ub, epoch_f
            )
            w = sides["windowed"]
            w["params"], w["opt"], m2 = win_step(w["params"], w["opt"], wb, epoch_f)
            ep_loss["single"].append(float(m1["loss"]))
            ep_loss["windowed"].append(float(m2["loss"]))
        for k in sides:
            sides[k]["loss"].append(float(np.mean(ep_loss[k])))
        d = abs(sides["single"]["loss"][-1] - sides["windowed"]["loss"][-1])
        print(
            f"epoch {ep + 1}/{args.epochs}: single {sides['single']['loss'][-1]:.4f} "
            f"windowed {sides['windowed']['loss'][-1]:.4f} |Δ|={d:.2e} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )

    result = {
        "recipe": {
            "epochs": args.epochs, "lr_drop": args.lr_drop,
            "train_scenarios": args.train, "batch": args.batch,
            "mesh": f"data=1 x graph={G} (virtual CPU)",
            "note": "windowed scenario-aligned production path vs "
                    "single-device union packs, same init/order; all "
                    "sub-packs asserted drop-free",
        },
        "train_loss_single": sides["single"]["loss"],
        "train_loss_windowed": sides["windowed"]["loss"],
        "final_abs_delta": abs(
            sides["single"]["loss"][-1] - sides["windowed"]["loss"][-1]
        ),
        "val_single": validate(sides["single"]["params"]),
        "val_windowed": validate(sides["windowed"]["params"]),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if "loss" not in k}, indent=2))


if __name__ == "__main__":
    main()
