"""Recipe-fidelity convergence run: our trainer vs the ACTUAL reference.

Trains our flax LaneGCN and the reference torch Net from the SAME initial
weights (via utils/torch_import.export_state_dict) on the SAME synthetic
scenarios in the SAME batch order, with the reference training recipe
scaled down (Adam, StepLR 1e-3 → 1e-4 at --lr-drop of --epochs; reference
lanegcn.py:36-39, utils.py:98-162, train.py:161-207). Per-epoch train loss
and held-out agent ADE/FDE curves for both sides are written to a JSON
sidecar — the synthetic stand-in for the reference's published
misc/train_log.txt.

Usage:
  python tools/convergence.py --out docs/convergence_r02.json \
      [--epochs 12] [--lr-drop 10] [--train 96] [--val 24] [--batch 4]
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

from lanegcn_tpu.config import Config, PackConfig, TrainConfig
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.registry import get_model
from lanegcn_tpu.train.loop import MetricAccumulator, make_eval_step, make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer
from lanegcn_tpu.utils.torch_import import export_state_dict

from tools.ref_shim import load_reference_lanegcn, reference_data

PACK = PackConfig(
    max_scenarios=4, max_actors=32, max_nodes=2048,
    max_edges_scale0=4096, max_edges_dilated=4096, max_edges_lr=1024,
    max_a2m_edges=16384, max_m2a_edges=16384, max_a2a_edges=1024,
)


def _scenarios(n, seed0):
    return [
        make_synthetic_scenario(seed=seed0 + i, num_corridors=2, num_actors=6)
        for i in range(n)
    ]


def _chunks(xs, size):
    return [xs[i : i + size] for i in range(0, len(xs), size)]


def _agent_metrics_np(reg, gt):
    """reference pred_metrics semantics (lanegcn.py:883-899): reg [K,T,2],
    gt [T,2] for the focal agent; ade1/fde1 = top-confidence mode, ade/fde =
    min-FDE mode."""
    err = np.sqrt(((reg - gt[None]) ** 2).sum(-1))  # [K, T]
    best = err[:, -1].argmin()
    return {
        "ade1": float(err[0].mean()),
        "fde1": float(err[0, -1]),
        "ade": float(err[best].mean()),
        "fde": float(err[best, -1]),
    }


def run_ours(config, bundle, params0, train_batches, val_batches, epochs):
    tx, lr_fn = make_optimizer(config.train)
    step = make_train_step(
        config, bundle.net, tx, lr_fn,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
    )
    eval_step = make_eval_step(
        config, bundle.net, loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn
    )
    params = jax.tree.map(jnp.array, params0)
    opt_state = tx.init(params)
    curves = {"loss": [], "ade": [], "fde": [], "ade1": [], "fde1": []}
    nb = len(train_batches)
    for epoch in range(epochs):
        losses = []
        for i, b in enumerate(train_batches):
            params, opt_state, m = step(params, opt_state, b, epoch + i / nb)
            losses.append(float(m["loss"]))
        acc = MetricAccumulator()
        for b in val_batches:
            _, m = eval_step(params, b)
            acc.update(m)
        s = acc.summary()
        curves["loss"].append(float(np.mean(losses)))
        for k in ("ade", "fde", "ade1", "fde1"):
            curves[k].append(float(s[k]))
        print(f"[ours]  epoch {epoch}: loss {curves['loss'][-1]:.4f} "
              f"ade {s['ade']:.4f} fde {s['fde']:.4f}", flush=True)
    return curves


def run_reference(ref, params0, mcfg, train_chunks, val_chunks, epochs, lr, lr_drop):
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params0, mcfg).items()}
    net = ref.Net(ref.config)
    net.load_state_dict(sd, strict=True)
    loss_mod = ref.Loss(ref.config)
    opt = torch.optim.Adam(net.parameters(), lr=lr[0], weight_decay=0)

    train_data = [reference_data(c) for c in train_chunks]
    val_data = [reference_data(c) for c in val_chunks]

    curves = {"loss": [], "ade": [], "fde": [], "ade1": [], "fde1": []}
    nb = len(train_data)
    for epoch in range(epochs):
        net.train()
        losses = []
        for i, data in enumerate(train_data):
            cur_lr = lr[0] if (epoch + i / nb) < lr_drop else lr[1]
            for g in opt.param_groups:
                g["lr"] = cur_lr
            out = net(data)
            loss_out = loss_mod(out, data)
            opt.zero_grad()
            loss_out["loss"].backward()
            opt.step()
            losses.append(float(loss_out["loss"].detach()))
        net.eval()
        sums = {"ade": 0.0, "fde": 0.0, "ade1": 0.0, "fde1": 0.0}
        count = 0
        with torch.no_grad():
            for data, chunk in zip(val_data, val_chunks):
                out = net(data)
                for j, s in enumerate(chunk):
                    m = _agent_metrics_np(
                        out["reg"][j][0].numpy(), np.asarray(s["gt_preds"][0])
                    )
                    for k in sums:
                        sums[k] += m[k]
                    count += 1
        curves["loss"].append(float(np.mean(losses)))
        for k in ("ade", "fde", "ade1", "fde1"):
            curves[k].append(sums[k] / count)
        print(f"[torch] epoch {epoch}: loss {curves['loss'][-1]:.4f} "
              f"ade {curves['ade'][-1]:.4f} fde {curves['fde'][-1]:.4f}", flush=True)
    return curves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lr-drop", type=float, default=10.0)
    ap.add_argument("--train", type=int, default=96)
    ap.add_argument("--val", type=int, default=24)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0,
                    help="model-init + data seed (multi-seed evidence)")
    ap.add_argument("--out", default="docs/convergence_r02.json")
    args = ap.parse_args()

    ref = load_reference_lanegcn()
    if ref is None:
        raise SystemExit("/root/reference not mounted")

    train_scens = _scenarios(args.train, seed0=20_000 * args.seed)
    val_scens = _scenarios(args.val, seed0=10_000 + 20_000 * args.seed)
    train_chunks = _chunks(train_scens, args.batch)
    val_chunks = _chunks(val_scens, args.batch)

    config = Config(
        pack=PACK,
        train=TrainConfig(lr=(1e-3, 1e-4), lr_epochs=(args.lr_drop,),
                          num_epochs=args.epochs, batch_size=args.batch),
    )
    bundle = get_model("lanegcn", config)
    config = bundle.config

    def pack(chunks):
        out = []
        for c in chunks:
            b, stats = pack_batch(c, config.pack, config.model)
            assert stats["packed_scenarios"] == len(c), stats
            out.append(jax.tree.map(jnp.asarray, b))
        return out

    train_batches = pack(train_chunks)
    val_batches = pack(val_chunks)
    params0 = bundle.net.init(jax.random.PRNGKey(args.seed), train_batches[0])["params"]

    t0 = time.time()
    ours = run_ours(config, bundle, params0, train_batches, val_batches, args.epochs)
    t_ours = time.time() - t0
    t0 = time.time()
    theirs = run_reference(
        ref, params0, config.model, train_chunks, val_chunks,
        args.epochs, (1e-3, 1e-4), args.lr_drop,
    )
    t_ref = time.time() - t0

    result = {
        "meta": {
            "epochs": args.epochs, "lr_drop": args.lr_drop,
            "train_scenarios": args.train, "val_scenarios": args.val,
            "batch": args.batch, "seed": args.seed,
            "wall_s_ours": round(t_ours, 1),
            "wall_s_torch_reference": round(t_ref, 1),
            "recipe": "Adam, StepLR 1e-3->1e-4, shared init, shared data/order",
        },
        "ours": ours,
        "reference_torch": theirs,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")
    print(f"final: ours loss {ours['loss'][-1]:.4f} ade {ours['ade'][-1]:.4f} "
          f"fde {ours['fde'][-1]:.4f} | torch loss {theirs['loss'][-1]:.4f} "
          f"ade {theirs['ade'][-1]:.4f} fde {theirs['fde'][-1]:.4f}")


if __name__ == "__main__":
    main()
