"""GroupNorm with exact torch semantics (channels-last layout).

The reference normalizes every block with ``nn.GroupNorm(gcd(ng, C), C)`` and
``ng=1`` in practice (reference layers.py:23,48,73; lanegcn.py:300), i.e.
per-sample normalization over all channels (and, for conv features, over the
time axis too). Per-sample statistics make the op padding-safe in packed
batches: padded rows never pollute real rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    num_groups: int = 1,
    eps: float = 1e-5,
) -> jax.Array:
    """Torch-parity GroupNorm for channels-last input.

    x: [N, C] or [N, L, C] (channels last; torch uses [N, C, L] — same math,
    statistics are over (L, C//G) per group per sample, matching
    torch.nn.GroupNorm's biased variance and eps-inside-sqrt).
    weight/bias: [C] per-channel affine.
    """
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    n = x.shape[0]
    orig_shape = x.shape
    # [N, S, G, C/G] where S is the flattened spatial extent (1 for 2-D input).
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    xg = jnp.swapaxes(xg, 1, 2)  # [N, G, S, C/G]
    mean = jnp.mean(xg, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(2, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = jnp.swapaxes(xg, 1, 2).reshape(orig_shape)
    return out * weight + bias
