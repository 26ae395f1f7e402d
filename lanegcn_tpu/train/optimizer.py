"""Optimizer + LR schedule with the reference's semantics (utils.py:98-177).

- StepLR: piecewise-constant lr as a function of *fractional* epoch
  (1e-3 → 1e-4 at epoch 32 for the published recipe).
- Adam with the per-step lr applied at update time (the reference sets
  param_group lr from lr_func(epoch) every step — utils.py:140-148);
  optional AdamW weight decay; optional elementwise gradient clipping to
  [clip_low, clip_high] (the reference clips gradient *values*, not norms —
  utils.py:150-159).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from lanegcn_tpu.config import TrainConfig


def step_lr(lrs: Sequence[float], boundaries: Sequence[float]) -> Callable:
    """Returns lr(epoch) — piecewise constant, jit-traceable.

    Implemented as a jnp.where chain rather than a gather: a data-dependent
    dynamic-slice from a captured constant array lowers to a ~100 ms stall on
    the TPU backend in use (measured — it dominated the whole train step),
    while the select chain is free.
    """
    lrs = tuple(float(x) for x in lrs)
    boundaries = tuple(float(b) for b in boundaries)

    def lr_fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        lr = jnp.float32(lrs[0])
        for b, l in zip(boundaries, lrs[1:]):
            lr = jnp.where(e >= b, jnp.float32(l), lr)
        return lr

    return lr_fn


def _clip_elementwise(low: float, high: float) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda g: jnp.clip(g, low, high), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig) -> Tuple[optax.GradientTransformation, Callable]:
    """Build the optax chain (lr-less) + the lr schedule.

    The returned transformation produces *ascent* directions scaled by adam;
    apply_updates expects the caller to scale by -lr(epoch) (see
    train/loop.py train_step), mirroring the reference's set-lr-then-step.
    """
    lr_fn = step_lr(cfg.lr, cfg.lr_epochs)

    chain = []
    if cfg.clip_grads:
        chain.append(_clip_elementwise(cfg.clip_low, cfg.clip_high))
    if cfg.opt in ("adam", "adamw"):
        chain.append(optax.scale_by_adam())
        wd = cfg.weight_decay if cfg.opt == "adam" else (cfg.weight_decay or 0.01)
        if wd:
            chain.append(optax.add_decayed_weights(wd))
    elif cfg.opt == "sgd":
        chain.append(optax.trace(decay=0.9))
    else:
        raise ValueError(f"unknown optimizer {cfg.opt!r}")

    return optax.chain(*chain), lr_fn


def apply_lr(updates, lr):
    """Scale optimizer updates by -lr (descent)."""
    return jax.tree.map(lambda u: -lr * u, updates)
