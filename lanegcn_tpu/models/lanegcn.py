"""LaneGCN: top-level network, loss, and metrics on packed batches.

Net pipeline (reference lanegcn.py:94-151):
    ActorNet ∥ MapNet → A2M → M2M → M2A → A2A → PredNet → world-frame transform

Loss (reference PredLoss lanegcn.py:740-807): max-margin mode classification
against the min-FDE mode + SmoothL1 regression on the best mode, both masked
and normalized by their support counts.

Everything operates on a single PackedBatch (one device's micro-batch);
data parallelism wraps this with shard_map (lanegcn_tpu.parallel).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config, LossConfig, ModelConfig
from lanegcn_tpu.graph import PackedBatch
from lanegcn_tpu.models.actor_net import ActorNet
from lanegcn_tpu.models.fusion import A2A, A2M, M2A, M2M
from lanegcn_tpu.models.map_net import MapNet
from lanegcn_tpu.models.pred_net import PredNet


class LaneGCN(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: PackedBatch) -> Dict[str, jax.Array]:
        """Returns packed outputs: cls [A, K], reg [A, K, T, 2] (world frame)."""
        cfg = self.cfg
        actor_ctrs = batch.actors.ctrs

        actors = ActorNet(cfg, dtype=self.dtype, name="actor_net")(
            batch.actors.feats.astype(self.dtype)
        )
        nodes = MapNet(cfg, dtype=self.dtype, name="map_net")(batch.graph)

        nodes = A2M(cfg, dtype=self.dtype, name="a2m")(
            nodes, batch.graph, actors, actor_ctrs, batch.fusion.a2m,
            batch.fusion.pair_a2m,
        )
        nodes = M2M(cfg, dtype=self.dtype, name="m2m")(nodes, batch.graph)
        actors = M2A(cfg, dtype=self.dtype, name="m2a")(
            actors, actor_ctrs, nodes, batch.graph.ctrs, batch.fusion.m2a,
            batch.fusion.pair_m2a,
        )
        actors = A2A(cfg, dtype=self.dtype, name="a2a")(
            actors, actor_ctrs, batch.fusion.a2a, batch.fusion.pair_a2a
        )

        cls, reg = PredNet(cfg, dtype=self.dtype, name="pred_net")(actors, actor_ctrs)

        # Agent frame → world frame: w = a @ R + orig (reference lanegcn.py:146-150).
        rot = jnp.take(batch.rot, batch.actors.scen, axis=0)  # [A, 2, 2]
        orig = jnp.take(batch.orig, batch.actors.scen, axis=0)  # [A, 2]
        reg = jnp.einsum("aktc,acd->aktd", reg.astype(jnp.float32), rot) + orig[:, None, None, :]
        return {"cls": cls.astype(jnp.float32), "reg": reg}


def smooth_l1(x: jax.Array) -> jax.Array:
    """torch nn.SmoothL1Loss elementwise (beta=1)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def pred_loss(
    out: Dict[str, jax.Array],
    batch: PackedBatch,
    cfg: LossConfig,
) -> Dict[str, jax.Array]:
    """Masked static-shape version of the reference PredLoss (lanegcn.py:740-807).

    Returns unnormalized sums + support counts so metrics aggregate across
    steps/hosts exactly like the reference's metric dicts.
    """
    cls, reg = out["cls"], out["reg"]  # [A, K], [A, K, T, 2]
    gt = batch.gt_preds  # [A, T, 2]
    has = batch.has_preds  # [A, T] bool
    a, k, t = reg.shape[0], reg.shape[1], reg.shape[2]

    # Last valid future step per actor (reference lanegcn.py:763-773).
    last = has.astype(jnp.float32) + 0.1 * jnp.arange(t, dtype=jnp.float32) / float(t)
    max_last = jnp.max(last, axis=1)
    last_idcs = jnp.argmax(last, axis=1)  # [A]
    valid = batch.actors.mask & (max_last > 1.0)  # actor has ≥1 future step

    # Final-step displacement per mode → min-FDE mode (lanegcn.py:776-788).
    reg_last = jnp.take_along_axis(reg, last_idcs[:, None, None, None], axis=2)[:, :, 0]  # [A,K,2]
    gt_last = jnp.take_along_axis(gt, last_idcs[:, None, None], axis=1)[:, 0]  # [A,2]
    dist = jnp.sqrt(jnp.sum(jnp.square(reg_last - gt_last[:, None, :]), axis=2))  # [A,K]
    min_dist = jnp.min(dist, axis=1)
    min_idcs = jnp.argmin(dist, axis=1)

    # Max-margin classification loss (lanegcn.py:790-799).
    cls_best = jnp.take_along_axis(cls, min_idcs[:, None], axis=1)  # [A,1]
    mgn = cls_best - cls  # [A,K]
    mask0 = (min_dist < cfg.cls_th)[:, None]
    mask1 = dist - min_dist[:, None] > cfg.cls_ignore
    sel = valid[:, None] & mask0 & mask1 & (mgn < cfg.mgn)
    num_cls = jnp.sum(sel.astype(jnp.float32))
    cls_loss = cfg.cls_coef * (cfg.mgn * num_cls - jnp.sum(jnp.where(sel, mgn, 0.0)))

    # SmoothL1 regression on the min-FDE mode (lanegcn.py:801-806).
    reg_best = jnp.take_along_axis(reg, min_idcs[:, None, None, None], axis=1)[:, 0]  # [A,T,2]
    reg_mask = valid[:, None] & has  # [A,T]
    per_elem = smooth_l1(reg_best - gt)  # [A,T,2]
    reg_loss = cfg.reg_coef * jnp.sum(jnp.where(reg_mask[:, :, None], per_elem, 0.0))
    num_reg = jnp.sum(reg_mask.astype(jnp.float32))

    loss = cls_loss / (num_cls + 1e-10) + reg_loss / (num_reg + 1e-10)
    return {
        "loss": loss,
        "cls_loss": cls_loss,
        "num_cls": num_cls,
        "reg_loss": reg_loss,
        "num_reg": num_reg,
    }


def agent_metrics(out: Dict[str, jax.Array], batch: PackedBatch) -> Dict[str, jax.Array]:
    """ADE/FDE sums for the focal AGENT of each scenario (reference
    pred_metrics lanegcn.py:883-899). Returns sums + counts for exact
    cross-step/cross-host aggregation."""
    reg = jnp.take(out["reg"], batch.agent_idx, axis=0)  # [B, K, T, 2]
    gt = jnp.take(batch.gt_preds, batch.agent_idx, axis=0)  # [B, T, 2]
    valid = batch.scen_mask.astype(jnp.float32)  # [B]

    err = jnp.sqrt(jnp.sum(jnp.square(reg - gt[:, None, :, :]), axis=3))  # [B, K, T]
    ade1 = jnp.sum(jnp.mean(err[:, 0, :], axis=1) * valid)
    fde1 = jnp.sum(err[:, 0, -1] * valid)
    min_idcs = jnp.argmin(err[:, :, -1], axis=1)  # min-FDE mode
    err_best = jnp.take_along_axis(err, min_idcs[:, None, None], axis=1)[:, 0]  # [B, T]
    ade = jnp.sum(jnp.mean(err_best, axis=1) * valid)
    fde = jnp.sum(err_best[:, -1] * valid)
    # Miss rate @2m on the best mode's final step (Argoverse MR definition).
    mr = jnp.sum((err_best[:, -1] > 2.0).astype(jnp.float32) * valid)
    return {
        "ade1_sum": ade1,
        "fde1_sum": fde1,
        "ade_sum": ade,
        "fde_sum": fde,
        "mr_sum": mr,
        "num_scen": jnp.sum(valid),
    }


def make_forward(config: Config, dtype: Any = jnp.float32):
    """Returns (module, pure forward fn): fn(params, batch) → out dict."""
    net = LaneGCN(config.model, dtype=dtype)

    def forward(params, batch: PackedBatch):
        return net.apply({"params": params}, batch)

    return net, forward
