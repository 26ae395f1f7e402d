"""1-D convolution and linear interpolation with torch-parity semantics.

ActorNet (reference lanegcn.py:212-263) is a 1-D conv FPN over 20-step
trajectories: strided Res1d downsampling + ``F.interpolate(scale_factor=2,
mode="linear", align_corners=False)`` top-down upsampling. We keep a
channels-last [N, L, C] layout (TPU-native) while matching torch's [N, C, L]
numerics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv1d(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """'same'-style conv1d matching torch Conv1d(padding=(K-1)//2, bias=False).

    x: [N, L, C_in] channels-last; w: [K, C_in, C_out].
    With K odd and padding (K-1)//2, output length is ceil(L/stride) — the
    torch formula floor((L + 2p - K)/stride) + 1 for these paddings.
    """
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def interpolate_linear(x: jax.Array, out_len: int) -> jax.Array:
    """torch F.interpolate(mode="linear", align_corners=False) on [N, L, C].

    Source coordinate of output i is (i + 0.5) * L/out_len - 0.5, clamped to
    [0, L-1]; values linearly blended between floor/ceil neighbors
    (reference lanegcn.py:259 uses scale_factor=2).
    """
    l_in = x.shape[1]
    scale = l_in / out_len
    coords = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    coords = jnp.clip(coords, 0.0, l_in - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, l_in - 1)
    w_hi = (coords - lo.astype(jnp.float32)).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=1)
    x_hi = jnp.take(x, hi, axis=1)
    return x_lo + (x_hi - x_lo) * w_hi[None, :, None]
