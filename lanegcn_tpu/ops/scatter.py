"""Masked gather / scatter-add primitives.

The reference's message passing is built on `Tensor.index_add_` float scatter
(reference lanegcn.py:337,344,350,703). On TPU we express the same dataflow as
masked dense gathers plus XLA scatter-add (deterministic by construction,
unlike CUDA atomics), with indices of invalid (padding) edges routed out of
range so the hardware drops them.

All functions take static-capacity edge arrays with a boolean validity mask —
see lanegcn_tpu.graph for the batch layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_gather(x: jax.Array, idx: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Gather rows ``x[idx]``; rows where ``mask`` is False are zeroed.

    x: [N, ...]; idx: [E] int; mask: [E] bool or None. Returns [E, ...].
    Out-of-range indices clamp (XLA default), but masked rows are zeroed so
    clamping never leaks data.
    """
    out = jnp.take(x, idx, axis=0, mode="clip")
    if mask is not None:
        out = jnp.where(mask.reshape(mask.shape + (1,) * (out.ndim - 1)), out, 0)
    return out


def scatter_add(
    data: jax.Array,
    idx: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    out: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """``out[idx[e]] += data[e]`` for valid edges; TPU-deterministic.

    data: [E, ...]; idx: [E] int; returns [num_segments, ...]. If ``out`` is
    given, accumulates into it (functional: returns the new array).
    Invalid edges have their index set out of range and are dropped by the
    scatter (mode="drop"), so no masking multiply is needed on the data path.
    indices_are_sorted: pass True when idx is non-decreasing over valid
    edges AND masked edges come last (the packer's destination-sorted
    layout — masked indices map to num_segments, preserving the order).
    """
    if mask is not None:
        idx = jnp.where(mask, idx, num_segments)
    if out is None:
        out = jnp.zeros((num_segments,) + data.shape[1:], dtype=data.dtype)
    return out.at[idx].add(data, mode="drop", indices_are_sorted=indices_are_sorted)


def segment_softmax(
    logits: jax.Array,
    idx: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable softmax over edges grouped by destination segment.

    Not used by the LaneGCN reference (its Att is sum-aggregated, not
    normalized) but part of the op surface for attention-style models.
    logits: [E]; returns [E] with softmax within each segment.
    """
    if mask is not None:
        safe_idx = jnp.where(mask, idx, num_segments)
    else:
        safe_idx = idx
    neg_inf = jnp.finfo(logits.dtype).min
    seg_max = jnp.full((num_segments,), neg_inf, dtype=logits.dtype)
    seg_max = seg_max.at[safe_idx].max(logits, mode="drop")
    shifted = logits - jnp.take(seg_max, jnp.clip(idx, 0, num_segments - 1), axis=0)
    ex = jnp.exp(shifted)
    if mask is not None:
        ex = jnp.where(mask, ex, 0.0)
    denom = scatter_add(ex, idx, num_segments, mask=mask)
    denom = jnp.take(denom, jnp.clip(idx, 0, num_segments - 1), axis=0)
    return ex / jnp.maximum(denom, jnp.finfo(logits.dtype).tiny)
