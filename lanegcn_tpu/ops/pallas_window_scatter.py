"""Window-slotted scatter-add: destination-sorted edge messages scattered
into a windowed node layout as dense one-hot MXU matmuls.

LanePooling (reference lanercnn.py:433-514) scatters ~936k per-edge context
messages into the target graph each way (r2g targets the scenario-windowed
global graph, g2r the bin-packed RoI windows) — the reference runs ONE CUDA
`index_add_` for this; XLA's TPU scatter executes rows serially (~14 ns/row
measured), making the pool-edge scatter the dominant LaneRCNN cost after
round 3's LaneConv window kernels (24.8 ms fwd / 32.1 ms bwd per step).

With edges destination-sorted AND chunk-aligned per destination window (the
packer inserts padding so no _WCHUNK-edge chunk straddles two destination
windows — data/packing.py window_chunked_edges), the scatter becomes, per
chunk,

    out_win += S_u @ msg_chunk,    S_u[w, e] = [lu[e] == w]

one one-hot MXU matmul per chunk; chunks of the same window are consecutive
grid steps, so the output block accumulates in VMEM and is written back
once per window. Windows with no edges keep `temp` via input/output
aliasing. The backward of the scatter is the mirrored one-hot gather
d_msg[e] = g[lu[e]] (no scatter op in either direction).

Plan arrays (built by data/packing.py window_chunked_edges):
  lu:     [E, 1] int32 window-local destination row; -1 marks padding.
  wchunk: [E / _WCHUNK] int32 destination window id per chunk (tail /
          all-padding chunks repeat the previous window id).
  first:  [E / _WCHUNK] int32, 1 iff the chunk is the first of its window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Chunk size shared with the packer's alignment (window_chunked_edges).
_WCHUNK = 512


def _fwd_kernel(wc_ref, first_ref, msg_ref, temp_ref, lu_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = temp_ref[:]

    lu = lu_ref[:]  # [_WCHUNK, 1]
    stride = out_ref.shape[0]
    dt = msg_ref.dtype
    s_u = (
        jnp.transpose(lu)
        == jax.lax.broadcasted_iota(jnp.int32, (stride, lu.shape[0]), 0)
    ).astype(dt)
    out_ref[:] = (
        out_ref[:].astype(jnp.float32)
        + jnp.dot(s_u, msg_ref[:], preferred_element_type=jnp.float32)
    ).astype(out_ref.dtype)


def _bwd_kernel(wc_ref, g_ref, lu_ref, dmsg_ref):
    lu = lu_ref[:]
    g_win = g_ref[:]
    dt = g_win.dtype
    stride = g_win.shape[0]
    g_u = (
        lu == jax.lax.broadcasted_iota(jnp.int32, (lu.shape[0], stride), 1)
    ).astype(dt)
    dmsg_ref[:] = jnp.dot(
        g_u, g_win, preferred_element_type=jnp.float32
    ).astype(dmsg_ref.dtype)


def _geometry(e: int, n: int, stride: int):
    assert e % _WCHUNK == 0 and n % stride == 0, (e, n, stride)
    return e // _WCHUNK


def _pallas_fwd(stride, interpret, msg, temp, lu, wchunk, first):
    from jax.experimental.pallas import tpu as pltpu

    from . import cost_model

    e, c = msg.shape
    n = temp.shape[0]
    nch = _geometry(e, n, stride)
    cost_model.record("window_scatter", "fwd", nch=nch, chunk=_WCHUNK,
                      stride=stride, c=c, db=msg.dtype.itemsize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((_WCHUNK, c), lambda i, wc, fr: (i, 0)),
            pl.BlockSpec((stride, c), lambda i, wc, fr: (wc[i], 0)),
            pl.BlockSpec((_WCHUNK, 1), lambda i, wc, fr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((stride, c), lambda i, wc, fr: (wc[i], 0)),
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), temp.dtype),
        grid_spec=grid_spec,
        input_output_aliases={3: 0},  # temp -> out (untouched windows keep it)
        interpret=interpret,
    )(wchunk, first, msg, temp, lu)


def _pallas_bwd(stride, interpret, g, lu, wchunk, msg_dtype):
    from jax.experimental.pallas import tpu as pltpu

    from . import cost_model

    n, c = g.shape
    e = lu.shape[0]
    nch = _geometry(e, n, stride)
    cost_model.record("window_scatter", "bwd", nch=nch, chunk=_WCHUNK,
                      stride=stride, c=c, db=jnp.dtype(msg_dtype).itemsize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((stride, c), lambda i, wc: (wc[i], 0)),
            pl.BlockSpec((_WCHUNK, 1), lambda i, wc: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_WCHUNK, c), lambda i, wc: (i, 0)),
    )
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((e, c), msg_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(wchunk, g, lu)


def xla_reference(msg, temp, lu, wchunk, first, stride):
    """Differentiable XLA formulation (CPU fallback + parity oracle)."""
    n, c = temp.shape
    lu_f = lu[:, 0]
    valid = lu_f >= 0
    base = jnp.repeat(wchunk.astype(jnp.int32) * stride, _WCHUNK)
    dst = jnp.where(valid, lu_f + base, n)
    add = jnp.zeros((n, c), jnp.float32).at[dst].add(
        jnp.where(valid[:, None], msg, 0).astype(jnp.float32), mode="drop"
    )
    return temp + add.astype(temp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _window_scatter_p(msg, temp, lu, wchunk, first, stride, interpret):
    return _pallas_fwd(stride, interpret, msg, temp, lu, wchunk, first)


def _ws_fwd(msg, temp, lu, wchunk, first, stride, interpret):
    out = _pallas_fwd(stride, interpret, msg, temp, lu, wchunk, first)
    return out, (lu, wchunk, first.shape)


def _ws_bwd(stride, interpret, res, g):
    lu, wchunk, first_shape = res
    dmsg = _pallas_bwd(stride, interpret, g, lu, wchunk, g.dtype)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    return (dmsg, g, f0(lu.shape), f0(wchunk.shape), f0(first_shape))


_window_scatter_p.defvjp(_ws_fwd, _ws_bwd)


def window_scatter_add(
    msg: jax.Array,  # [E, C] per-edge messages (dest-sorted, chunk-aligned)
    temp: jax.Array,  # [N, C] accumulator (result = temp + scatter)
    lu: jax.Array,  # [E, 1] int32 window-local destinations (-1 pad)
    wchunk: jax.Array,  # [E/_WCHUNK] int32 destination window per chunk
    first: jax.Array,  # [E/_WCHUNK] int32 first-chunk-of-window flags
    stride: int,
    mode: str = "on",  # "on" | "interpret" | "xla"
) -> jax.Array:
    """temp + scatter_add(msg → windowed rows); grads flow to msg and temp
    (hand-written VJP; both directions one-hot Pallas matmuls, no scatter)."""
    if mode == "xla":
        return xla_reference(msg, temp, lu, wchunk, first, stride)
    return _window_scatter_p(
        msg, temp, lu, wchunk, first, int(stride), mode == "interpret"
    )
