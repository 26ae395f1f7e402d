"""Optimizer + LR schedule with the reference's semantics (utils.py:98-177).

- StepLR: piecewise-constant lr as a function of *fractional* epoch
  (1e-3 → 1e-4 at epoch 32 for the published recipe).
- Adam with the per-step lr applied at update time (the reference sets
  param_group lr from lr_func(epoch) every step — utils.py:140-148);
  optional AdamW weight decay; optional elementwise gradient clipping to
  [clip_low, clip_high] (the reference clips gradient *values*, not norms —
  utils.py:150-159).
- Per-group lr coefficients (the reference's `Optimizer(params, config, coef)`
  scales each param group's lr by coef[i] — utils.py:99-147): expressed here
  as (param-path-prefix, coef) rules in TrainConfig.lr_coef, applied as a
  per-leaf scale on the update direction (equivalent for elementwise
  optimizers since lr enters each leaf's update linearly).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

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


def _leaf_path(path) -> str:
    """Render a tree path as 'a/b/c' (flax param dicts → module/.../kernel)."""
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def coef_tree(params, rules: Sequence[Tuple[str, float]]):
    """Per-leaf lr coefficient from (path-prefix, coef) rules; first matching
    rule wins, unmatched leaves get 1.0 (reference coef=None ⇒ [1.0]*groups,
    utils.py:103-110)."""

    def coef_for(path, leaf):
        del leaf
        p = _leaf_path(path)
        for prefix, c in rules:
            if p.startswith(prefix):
                return float(c)
        return 1.0

    return jax.tree_util.tree_map_with_path(coef_for, params)


def _scale_by_coef(rules: Sequence[Tuple[str, float]]) -> optax.GradientTransformation:
    """Per-leaf update scaling for the per-leaf optax path (sgd)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        coefs = coef_tree(updates, rules)
        updates = jax.tree.map(lambda u, c: u * c, updates, coefs)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _clip_elementwise(low: float, high: float) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda g: jnp.clip(g, low, high), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


class FusedAdamState(NamedTuple):
    """Adam moments over one flat parameter buffer."""

    count: jax.Array  # [] int32
    mu: jax.Array  # [P] float32
    nu: jax.Array  # [P] float32


@dataclasses.dataclass(frozen=True)
class FusedOptimizer:
    """optax-compatible (init/update) transformation whose state and math
    live on ONE flat buffer.

    The model has ~300 parameter leaves; per-leaf optax updates lower to
    thousands of tiny TPU ops whose fixed per-op cost dominated the train
    step (measured 3.4 ms of a 5.5 ms step). Flattening turns the whole
    update into a handful of [P]-wide vector ops. `fused_apply` additionally
    folds the -lr scale and the parameter add into the flat domain so the
    train step pays exactly one unravel.
    """

    init: Callable
    update: Callable
    fused_apply: Callable  # (params, grads, state, lr) → (new_params, state)


def _make_fused_adam(
    wd: float,
    clip: Optional[Tuple[float, float]],
    b1=0.9,
    b2=0.999,
    eps=1e-8,
    coef_rules: Sequence[Tuple[str, float]] = (),
) -> FusedOptimizer:
    def flat_coef(params):
        """[P] per-element lr coefficient in ravel order (constant-folded by
        XLA — coefs are trace-time constants)."""
        coefs = coef_tree(params, coef_rules)
        full = jax.tree.map(
            lambda p, c: jnp.full(p.shape, c, jnp.float32), params, coefs
        )
        return ravel_pytree(full)[0]

    def direction(flat_g, state, flat_p):
        """Ascent direction u (caller applies -lr·u), matching
        optax.scale_by_adam (+ add_decayed_weights) bias-corrected math."""
        if clip is not None:
            flat_g = jnp.clip(flat_g, clip[0], clip[1])
        count = state.count + 1
        mu = b1 * state.mu + (1 - b1) * flat_g
        nu = b2 * state.nu + (1 - b2) * jnp.square(flat_g)
        c = count.astype(jnp.float32)
        mhat = mu / (1 - b1**c)
        nuhat = nu / (1 - b2**c)
        u = mhat / (jnp.sqrt(nuhat) + eps)
        if wd:
            u = u + wd * flat_p
        return u, FusedAdamState(count, mu, nu)

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        return FusedAdamState(
            jnp.zeros((), jnp.int32), jnp.zeros_like(flat), jnp.zeros_like(flat)
        )

    def update_fn(updates, state, params=None):
        flat_g, unravel = ravel_pytree(updates)
        flat_p = ravel_pytree(params)[0] if params is not None else 0.0
        u, state = direction(flat_g, state, flat_p)
        if coef_rules:
            u = u * flat_coef(params if params is not None else updates)
        return unravel(u), state

    def fused_apply(params, grads, state, lr, ok=None):
        """One flat-domain update; when `ok` (scalar bool) is given, a False
        step leaves params AND moments bitwise unchanged (non-finite-grad
        guard — the whole select happens on the flat buffers, so the guard
        adds three [P]-wide selects, not per-leaf ops)."""
        flat_p, unravel = ravel_pytree(params)
        flat_g, _ = ravel_pytree(grads)
        u, new_state = direction(flat_g, state, flat_p)
        if coef_rules:
            u = u * flat_coef(params)
        flat_new = flat_p - lr * u
        if ok is None:
            return unravel(flat_new), new_state
        flat_new = jnp.where(ok, flat_new, flat_p)
        state = FusedAdamState(
            count=jnp.where(ok, new_state.count, state.count),
            mu=jnp.where(ok, new_state.mu, state.mu),
            nu=jnp.where(ok, new_state.nu, state.nu),
        )
        return unravel(flat_new), state

    return FusedOptimizer(init=init_fn, update=update_fn, fused_apply=fused_apply)


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
        wd = cfg.weight_decay if cfg.opt == "adam" else (cfg.weight_decay or 0.01)
        clip = (cfg.clip_low, cfg.clip_high) if cfg.clip_grads else None
        return _make_fused_adam(wd or 0.0, clip, coef_rules=cfg.lr_coef), lr_fn
    elif cfg.opt == "sgd":
        chain.append(optax.trace(decay=0.9))
    else:
        raise ValueError(f"unknown optimizer {cfg.opt!r}")
    if cfg.lr_coef:
        chain.append(_scale_by_coef(cfg.lr_coef))

    return optax.chain(*chain), lr_fn


def apply_lr(updates, lr):
    """Scale optimizer updates by -lr (descent)."""
    return jax.tree.map(lambda u: -lr * u, updates)


def optimizer_step(tx, params, grads, opt_state, lr):
    """Apply one optimizer update; prefers the flat fused path when the
    transformation provides one (FusedOptimizer), else the per-leaf optax
    path (updates tree scaled by -lr, added to params)."""
    if hasattr(tx, "fused_apply"):
        return tx.fused_apply(params, grads, opt_state, lr)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, apply_lr(updates, lr))
    return params, opt_state


def grads_finite(grads, *scalars) -> jax.Array:
    """Scalar bool: every gradient element (and every extra scalar, e.g. the
    loss) is finite. One [P]-wide reduction in the flat domain; XLA CSEs the
    ravel with the fused optimizer's own."""
    flat_g, _ = ravel_pytree(grads)
    ok = jnp.all(jnp.isfinite(flat_g))
    for s in scalars:
        ok = ok & jnp.isfinite(jnp.asarray(s, jnp.float32))
    return ok


def guarded_optimizer_step(tx, params, grads, opt_state, lr, loss):
    """optimizer_step that SKIPS the update when the loss or any gradient is
    non-finite (params and optimizer state stay bitwise unchanged), returning
    (params, opt_state, ok). Failure detection the reference lacks
    (SURVEY.md §5): one poisoned batch cannot destroy a long run, and the
    guard is a scalar select — no host sync, no extra dispatch."""
    ok = grads_finite(grads, loss)
    if hasattr(tx, "fused_apply"):
        params, opt_state = tx.fused_apply(params, grads, opt_state, lr, ok=ok)
        return params, opt_state, ok
    new_p, new_s = optimizer_step(tx, params, grads, opt_state, lr)
    sel = lambda n, o: jnp.where(ok, n, o)  # noqa: E731
    return (
        jax.tree.map(sel, new_p, params),
        jax.tree.map(sel, new_s, opt_state),
        ok,
    )
