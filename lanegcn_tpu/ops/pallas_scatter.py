"""Pallas TPU kernel: block-parallel segment-sum over destination-sorted edges.

The LaneConv/Att aggregation is `out[u] += msg[e]` (reference `index_add_`,
lanegcn.py:337,703). XLA's generic scatter-add serializes updates; when edges
are pre-sorted by destination (the packer can emit this order), destinations
tile into contiguous blocks and the reduction becomes an MXU matmul per
block: a run-membership one-hot [E_blk, rows] contracted with the message
rows [E_blk, C], accumulated entirely in VMEM — one HBM write per output row
instead of one read-modify-write per edge.

ops.scatter.scatter_add remains the general-case default; this kernel is the
speed-of-light path for dense-degree segment reductions. Measured head-to-head
at LaneGCN production sizes (196k edges x 128 ch into 393k nodes, ~0.5
edges/row), XLA's native scatter wins (bf16 fwd 3.0 ms vs 4.7 ms) because the
edge window must cover the densest block, so degree skew makes every block pay
worst-case one-hot FLOPs while the op is memory-bound — hence the models keep
scatter_add (see docs/PERFORMANCE.md). Deterministic by construction either
way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sorted_segment_sum(
    data: jax.Array,  # [E, C] messages, sorted by destination
    seg_ids: jax.Array,  # [E] int32 destinations, non-decreasing; >= num_segments drops
    num_segments: int,
    block_rows: int = 128,
    max_edges_per_block: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Segment-sum for destination-sorted edges.

    max_edges_per_block bounds the edge window each destination block reads
    (must cover the densest block; defaults to E — always correct). Each
    block DMAs a 128-aligned window of edges from HBM into VMEM, then
    reduces with one MXU matmul: onehot[row, e] = (seg[e] − b·rows == row),
    contracted with the message rows. Out-of-block edges in the window can
    never match a row, so window overlap is harmless; drop edges
    (seg == num_segments) land on the sliced-off padding row.
    """
    e, c = data.shape
    num_blocks = pl.cdiv(num_segments, block_rows)
    mepb = max_edges_per_block or e
    # Window = aligned start slack + edges, rounded to the 1-D int32 DMA
    # tiling (1024 elements); dim-0 of the 2-D data slice needs only 8.
    align = 1024
    w = int(-(-(mepb + align) // align) * align)

    seg_ids = seg_ids.astype(jnp.int32)
    block_of_edge = seg_ids // block_rows
    block_starts = jnp.searchsorted(
        block_of_edge, jnp.arange(num_blocks, dtype=jnp.int32)
    ).astype(jnp.int32)

    # Pad so every window read stays in bounds; pad seg with num_segments
    # (matches only the sliced-off row, and only against zero-padded data).
    data_p = jnp.pad(data, ((0, w), (0, 0)))
    seg_p = jnp.pad(seg_ids, (0, w), constant_values=num_segments)

    def kernel(starts_ref, seg_ref, data_ref, out_ref, seg_s, data_s, sems):
        b = pl.program_id(0)
        start = starts_ref[b]
        sa = (start // 1024) * 1024  # DMA offset aligned to 1-D tiling

        # Inputs live in HBM (pltpu.ANY): DMA the block's edge window to VMEM.
        cp_d = pltpu.make_async_copy(data_ref.at[pl.ds(sa, w)], data_s, sems.at[0])
        cp_s = pltpu.make_async_copy(seg_ref.at[pl.ds(sa, w)], seg_s, sems.at[1])
        cp_d.start()
        cp_s.start()
        cp_d.wait()
        cp_s.wait()

        loc = seg_s[:] - b * block_rows  # [W]; in [0, block_rows) iff ours
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (block_rows, w), 0)
        onehot = (loc[None, :] == row_iota).astype(data_s.dtype)
        # f32 path needs HIGHEST: the MXU's default bf16 multiply would round
        # the f32 messages (the one-hot operand makes this a pure selection,
        # so full precision costs only the extra f32 passes). bf16 inputs are
        # exact under DEFAULT — and Mosaic rejects fp32 contract precision on
        # bf16 operands — so gate on dtype; accumulation is f32 either way.
        prec = (
            jax.lax.Precision.HIGHEST
            if data_s.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out_ref[:, :] = jax.lax.dot_general(
            onehot,
            data_s[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # seg ids (windowed DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # messages (windowed DMA)
        ],
        out_specs=pl.BlockSpec(
            (block_rows, c), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((w,), jnp.int32),
            pltpu.VMEM((w, c), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((int(num_blocks) * block_rows, c), data.dtype),
        interpret=interpret,
    )(block_starts, seg_p, data_p)
    return out[:num_segments]


def sort_edges_by_destination(u, v, mask, num_segments):
    """Host/device helper: stable-sort an EdgeSet's arrays by destination,
    routing masked edges to the end (seg id = num_segments)."""
    key = jnp.where(mask, u, num_segments)
    order = jnp.argsort(key, stable=True)
    return key[order], v[order], mask[order], order


def _ssum_fwd(data, seg_ids, num_segments, block_rows, max_edges_per_block, interpret):
    out = sorted_segment_sum(
        data, seg_ids, num_segments,
        block_rows=block_rows,
        max_edges_per_block=max_edges_per_block,
        interpret=interpret,
    )
    return out, seg_ids


def _ssum_bwd(num_segments, block_rows, max_edges_per_block, interpret, seg_ids, cot):
    # d/d data of out[seg[e]] += data[e] is cot[seg[e]]; dropped edges
    # (seg >= num_segments) get zero cotangent.
    safe = jnp.clip(seg_ids, 0, num_segments - 1)
    d = jnp.take(cot, safe, axis=0)
    d = jnp.where((seg_ids < num_segments)[:, None], d, 0)
    return (d, None)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _sorted_segment_sum_ad(
    data, seg_ids, num_segments, block_rows, max_edges_per_block, interpret
):
    return sorted_segment_sum(
        data, seg_ids, num_segments,
        block_rows=block_rows,
        max_edges_per_block=max_edges_per_block,
        interpret=interpret,
    )


_sorted_segment_sum_ad.defvjp(_ssum_fwd, _ssum_bwd)


def scatter_add_sorted(
    data: jax.Array,
    idx: jax.Array,
    num_segments: int,
    mask: jax.Array | None = None,
    out: jax.Array | None = None,
    block_rows: int = 128,
    max_edges_per_block: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.scatter.scatter_add when ``idx`` is non-decreasing
    (destination-sorted edge lists, emitted by the packer's sort_edges
    option). Runs the Pallas block segment-sum on the forward pass and a
    gather on the backward. Masked edges must carry idx == num_segments
    (the packer's sorted layout routes padding to the end); a boolean mask
    is accepted for API parity and folded into the index."""
    if mask is not None:
        idx = jnp.where(mask, idx, num_segments)
    res = _sorted_segment_sum_ad(
        data, idx.astype(jnp.int32), num_segments, block_rows,
        max_edges_per_block, interpret,
    )
    if out is not None:
        res = out + res.astype(out.dtype)
    return res
