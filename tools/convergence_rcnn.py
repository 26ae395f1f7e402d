"""LaneRCNN recipe-fidelity convergence: our trainer vs the ACTUAL reference.

Same contract as tools/convergence.py, for the RCNN family: both sides start
from the SAME initial weights (utils/torch_import.export_state_dict with the
lanercnn table), consume the SAME synthetic RoI scenarios in the SAME order,
and run the reference recipe — AdamW + weight_decay 0.01 (reference
lanercnn.py:37-42), gt transformed to the agent frame in the loop (reference
train_lanercnn.py:153-157; our packer bakes the same transform).

Batch size is 1 BY DESIGN: the reference Decode's refinement pooling has an
off-by-scenario context-index bug for batch > 1 (reference
lanercnn.py:474-479 — the motion-graph ctrs lists are [1, T, 2]-shaped so
the offset advances by 1 instead of T); at batch 1 both sides compute the
intended semantics (tests/test_torch_import_rcnn.py pins forward parity).

Usage:
  python tools/convergence_rcnn.py --out docs/convergence_rcnn_r03.json \
      [--epochs 8] [--train 48] [--val 32]
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

import dataclasses

import jax.numpy as jnp
import numpy as np

from lanegcn_tpu.config import Config, RoiPackConfig, TrainConfig
from lanegcn_tpu.data import make_synthetic_scenario
from lanegcn_tpu.data.lane_roi import generate_lane_rois
from lanegcn_tpu.data.packing_roi import pack_roi_batch
from lanegcn_tpu.models.registry import get_model
from lanegcn_tpu.train.loop import make_eval_step, make_train_step
from lanegcn_tpu.train.optimizer import make_optimizer
from lanegcn_tpu.utils.torch_import import export_state_dict

from tools.ref_shim import load_reference_lanercnn, reference_roi_data

ROI_PACK = RoiPackConfig(
    max_scenarios=1, max_rois=8, max_roi_nodes=1024, max_interest_nodes=256,
    max_global_nodes=1024, max_edges_scale0=2048, max_edges_dilated=2048,
    max_edges_lr=2048, max_a2m_edges=512, max_pool_edges=16384,
    max_a2r_edges=512,
)


def _scenarios(n, seed0):
    return [
        generate_lane_rois(
            make_synthetic_scenario(seed=seed0 + i, num_corridors=2, num_actors=5)
        )
        for i in range(n)
    ]


def _metrics_np(trajs, gt):
    err = np.sqrt(((trajs - gt[None]) ** 2).sum(-1))  # [K, T]
    best = err[:, -1].argmin()
    return float(err[best].mean()), float(err[best, -1])


def run_ours(config, bundle, params0, batches, val_batches, epochs):
    tx, lr_fn = make_optimizer(config.train)
    step = make_train_step(
        config, bundle.net, tx, lr_fn, bundle.loss_fn, bundle.metrics_fn
    )
    eval_step = make_eval_step(config, bundle.net, bundle.loss_fn, bundle.metrics_fn)
    params = jax.tree.map(jnp.array, params0)
    opt_state = tx.init(params)
    curves = {"loss": [], "ade": [], "fde": []}
    nb = len(batches)
    for epoch in range(epochs):
        losses = []
        for i, b in enumerate(batches):
            params, opt_state, m = step(params, opt_state, b, epoch + i / nb)
            losses.append(float(m["loss"]))
        sums = np.zeros(3)
        for b in val_batches:
            out, _ = eval_step(params, b)
            ade, fde = _metrics_np(
                np.asarray(out["pred_trajs"])[0], np.asarray(b.gt_preds)[0]
            )
            sums += [ade, fde, 1]
        curves["loss"].append(float(np.mean(losses)))
        curves["ade"].append(sums[0] / sums[2])
        curves["fde"].append(sums[1] / sums[2])
        print(f"[ours]  epoch {epoch}: loss {curves['loss'][-1]:.4f} "
              f"ade {curves['ade'][-1]:.4f} fde {curves['fde'][-1]:.4f}", flush=True)
    return curves


def _agent_frame_gt(data):
    """Reference train_lanercnn.py:153-157: gt → agent frame in the loop."""
    import torch

    for i in range(len(data["gt_preds"])):
        orig, rot = data["orig"][i], data["rot"][i]
        data["gt_preds"][i] = torch.matmul(
            data["gt_preds"][i].view(-1, 30, 2) - orig.view(1, 1, -1),
            rot.transpose(1, 0),
        )
    return data


def run_reference(ref, params0, mcfg, train_scens, val_scens, epochs, lr, lr_drop):
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params0, mcfg, model="lanercnn").items()}
    net = ref.Net(ref.config)
    net.load_state_dict(sd, strict=True)
    loss_mod = ref.Loss(ref.config)
    # reference recipe: AdamW + wd 0.01 (lanercnn.py:37-42)
    opt = torch.optim.AdamW(net.parameters(), lr=lr[0], weight_decay=0.01)

    train_data = [_agent_frame_gt(reference_roi_data([s])) for s in train_scens]
    val_data = [_agent_frame_gt(reference_roi_data([s])) for s in val_scens]

    curves = {"loss": [], "ade": [], "fde": []}
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
        sums = np.zeros(3)
        with torch.no_grad():
            for data, scen in zip(val_data, val_scens):
                out = net(data)
                gt = data["gt_preds"][0][0].numpy()
                ade, fde = _metrics_np(out["pred_trajs"][0].numpy(), gt)
                sums += [ade, fde, 1]
        curves["loss"].append(float(np.mean(losses)))
        curves["ade"].append(sums[0] / sums[2])
        curves["fde"].append(sums[1] / sums[2])
        print(f"[torch] epoch {epoch}: loss {curves['loss'][-1]:.4f} "
              f"ade {curves['ade'][-1]:.4f} fde {curves['fde'][-1]:.4f}", flush=True)
    return curves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr-drop", type=float, default=6.0)
    ap.add_argument("--train", type=int, default=48)
    ap.add_argument("--val", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="docs/convergence_rcnn_r03.json")
    args = ap.parse_args()

    ref = load_reference_lanercnn()
    if ref is None:
        raise SystemExit("/root/reference not mounted")

    train_scens = _scenarios(args.train, seed0=30_000 + 50_000 * args.seed)
    val_scens = _scenarios(args.val, seed0=40_000 + 50_000 * args.seed)

    config = Config(
        roi_pack=ROI_PACK,
        train=TrainConfig(lr=(1e-3, 1e-4), lr_epochs=(args.lr_drop,),
                          num_epochs=args.epochs, batch_size=1),
    )
    bundle = get_model("lanercnn", config)
    # keep our batch-1 pack + lr schedule; the factory sets AdamW + wd
    config = dataclasses.replace(
        bundle.config, roi_pack=ROI_PACK,
        train=dataclasses.replace(
            bundle.config.train, lr=(1e-3, 1e-4), lr_epochs=(args.lr_drop,)
        ),
    )
    assert config.train.opt == "adamw", config.train

    def pack(scens):
        out = []
        for s in scens:
            b, stats = pack_roi_batch([s], config.roi_pack, config.model)
            assert stats["packed_scenarios"] == 1, stats
            drops = {k: v for k, v in stats.items()
                     if k.startswith("dropped") and np.any(v)}
            assert not drops, drops
            out.append(jax.tree.map(jnp.asarray, b))
        return out

    train_batches = pack(train_scens)
    val_batches = pack(val_scens)
    params0 = bundle.net.init(jax.random.PRNGKey(args.seed), train_batches[0])["params"]

    t0 = time.time()
    ours = run_ours(config, bundle, params0, train_batches, val_batches, args.epochs)
    t_ours = time.time() - t0
    t0 = time.time()
    theirs = run_reference(
        ref, params0, config.model, train_scens, val_scens,
        args.epochs, (1e-3, 1e-4), args.lr_drop,
    )
    t_ref = time.time() - t0

    result = {
        "meta": {
            "epochs": args.epochs, "lr_drop": args.lr_drop,
            "train_scenarios": args.train, "val_scenarios": args.val,
            "batch": 1, "seed": args.seed,
            "wall_s_ours": round(t_ours, 1),
            "wall_s_torch_reference": round(t_ref, 1),
            "recipe": "AdamW wd=0.01, StepLR 1e-3->1e-4, agent-frame gt, "
                      "shared init, shared data/order, batch 1 (see module "
                      "docstring re the reference's batch>1 decode bug)",
        },
        "ours": ours,
        "reference_torch": theirs,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {args.out}")
    print(f"final: ours loss {ours['loss'][-1]:.4f} ade {ours['ade'][-1]:.4f} "
          f"| torch loss {theirs['loss'][-1]:.4f} ade {theirs['ade'][-1]:.4f}")


if __name__ == "__main__":
    main()
