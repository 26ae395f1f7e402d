"""Train/eval steps and the training loop (reference train.py:161-255).

The jitted train step = forward + loss + grad + Adam update + metric sums.
Fractional-epoch LR scheduling, periodic checkpointing, and metric
aggregation mirror the reference recipe; everything device-side is a single
compiled function per bucket.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp

from lanegcn_tpu.config import Config
from lanegcn_tpu.graph import PackedBatch
from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss
from lanegcn_tpu.train.optimizer import (
    guarded_optimizer_step,
    make_optimizer,
    optimizer_step,
)


class TrainState:
    """Immutable-ish bundle of params + opt state + step counter."""

    def __init__(self, params, opt_state, step: int = 0):
        self.params = params
        self.opt_state = opt_state
        self.step = step


def init_state(config: Config, rng_key, sample_batch: PackedBatch, dtype=jnp.float32):
    net = LaneGCN(config.model, dtype=dtype)
    params = net.init(rng_key, sample_batch)["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    return net, TrainState(params, opt_state), tx, lr_fn


def make_train_step(
    config: Config, net, tx, lr_fn, loss_fn=None, metrics_fn=None
) -> Callable:
    """Returns jitted fn(params, opt_state, batch, epoch) →
    (params, opt_state, metrics). loss_fn/metrics_fn default to LaneGCN's;
    pass the model bundle's for other families (e.g. LaneRCNN)."""
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics

    def objective(params, batch):
        out = net.apply({"params": params}, batch)
        losses = loss_fn(out, batch, config.loss)
        return losses["loss"], (losses, out)

    guard = config.train.nan_guard

    @jax.jit
    def train_step(params, opt_state, batch, epoch):
        (_, (losses, out)), grads = jax.value_and_grad(objective, has_aux=True)(params, batch)
        lr = lr_fn(epoch)
        metrics = dict(losses)
        if guard:
            params, opt_state, ok = guarded_optimizer_step(
                tx, params, grads, opt_state, lr, losses["loss"]
            )
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        else:
            params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
        metrics.update(metrics_fn(out, batch))
        metrics["lr"] = lr
        return params, opt_state, metrics

    return train_step


def make_multi_train_step(
    config: Config, net, tx, lr_fn, loss_fn=None, metrics_fn=None
) -> Callable:
    """K training steps per dispatch: lax.scan over stacked batches.

    fn(params, opt_state, batches[K, ...], epoch0, d_epoch) →
    (params, opt_state, metrics) where metrics are summed over the K steps
    (loss = mean, lr = last). One host→device round trip per K steps — hides
    dispatch latency, which dominates when steps are ~ms (single-chip LaneGCN
    runs at ~2 ms/step; per-call dispatch costs tens of ms through a relay).
    """
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics

    def objective(params, batch):
        out = net.apply({"params": params}, batch)
        losses = loss_fn(out, batch, config.loss)
        return losses["loss"], (losses, out)

    guard = config.train.nan_guard

    @jax.jit
    def multi_step(params, opt_state, batches, epoch0, d_epoch):
        def body(carry, batch):
            params, opt_state, i = carry
            epoch = epoch0 + i * d_epoch
            (_, (losses, out)), grads = jax.value_and_grad(objective, has_aux=True)(
                params, batch
            )
            lr = lr_fn(epoch)
            metrics = dict(losses)
            if guard:
                params, opt_state, ok = guarded_optimizer_step(
                    tx, params, grads, opt_state, lr, losses["loss"]
                )
                metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
            else:
                params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
            metrics.update(metrics_fn(out, batch))
            metrics["lr"] = lr
            return (params, opt_state, i + 1.0), metrics

        (params, opt_state, _), metrics = jax.lax.scan(
            body, (params, opt_state, 0.0), batches
        )
        out = jax.tree.map(lambda x: jnp.sum(x, axis=0), metrics)
        out["loss"] = jnp.mean(metrics["loss"])
        out["lr"] = metrics["lr"][-1]
        return params, opt_state, out

    return multi_step


def make_eval_step(config: Config, net, loss_fn=None, metrics_fn=None) -> Callable:
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics

    @jax.jit
    def eval_step(params, batch):
        out = net.apply({"params": params}, batch)
        losses = loss_fn(out, batch, config.loss)
        metrics = dict(losses)
        metrics.update(metrics_fn(out, batch))
        return out, metrics

    return eval_step


class MetricAccumulator:
    """Running sums of loss/metric components (reference PostProcess.append
    lanegcn.py:836-855), normalized at display time."""

    def __init__(self):
        self.sums: Dict[str, float] = {}

    def update(self, metrics: Dict[str, Any]):
        for k, v in metrics.items():
            if k in ("loss", "lr"):
                continue
            self.sums[k] = self.sums.get(k, 0.0) + float(v)

    def summary(self) -> Dict[str, float]:
        s = self.sums
        eps = 1e-10
        out = {
            "cls": s.get("cls_loss", 0.0) / (s.get("num_cls", 0.0) + eps),
            "reg": s.get("reg_loss", 0.0) / (s.get("num_reg", 0.0) + eps),
        }
        out["loss"] = out["cls"] + out["reg"]
        n = s.get("num_scen", 0.0) + eps
        out["ade1"] = s.get("ade1_sum", 0.0) / n
        out["fde1"] = s.get("fde1_sum", 0.0) / n
        out["ade"] = s.get("ade_sum", 0.0) / n
        out["fde"] = s.get("fde_sum", 0.0) / n
        out["mr"] = s.get("mr_sum", 0.0) / n
        return out

    def reset(self):
        self.sums = {}


def train_epochs(
    config: Config,
    net: LaneGCN,
    state: TrainState,
    tx,
    lr_fn,
    batches: Iterable[PackedBatch],
    num_steps: int,
    steps_per_epoch: int,
    log_every: int = 50,
    log_fn=print,
) -> Tuple[TrainState, Dict[str, float]]:
    """Simple single-host loop over an iterable of packed batches."""
    train_step = make_train_step(config, net, tx, lr_fn)
    acc = MetricAccumulator()
    params, opt_state = state.params, state.opt_state
    t0 = time.time()
    step = state.step
    for batch in batches:
        if step >= num_steps:
            break
        epoch = step / max(steps_per_epoch, 1)
        params, opt_state, metrics = train_step(params, opt_state, batch, epoch)
        acc.update(metrics)
        step += 1
        if step % log_every == 0:
            s = acc.summary()
            log_fn(
                f"step {step} epoch {epoch:.3f} lr {float(metrics['lr']):.5f} "
                f"loss {s['loss']:.4f} cls {s['cls']:.4f} reg {s['reg']:.4f} "
                f"ade {s['ade']:.4f} fde {s['fde']:.4f} ({time.time() - t0:.1f}s)"
            )
    return TrainState(params, opt_state, step), acc.summary()
