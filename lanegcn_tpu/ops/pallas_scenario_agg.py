"""Scenario-blocked overflow-edge aggregation: gather + relation transform +
scatter as dense one-hot MXU matmuls, one Pallas grid step per scenario.

The LaneConv overflow edges (duplicate-destination / cross-junction residue
after band+table splitting — reference lanegcn.py:329-362 runs ONE CUDA
`index_add_` per relation for all of this) are strictly scenario-local:
every (u, v) connects nodes of one scenario. With the packer's STRIDED node
layout (scenario s owns rows [s*stride, (s+1)*stride) — data/packing.py
`node_stride`), the whole irregular aggregation becomes, per scenario,

    out_win += S_u @ (Σ_r mask_r ⊙ (G_v @ feat_win) @ W_r)

where G_v [E, W] / S_u [W, E] are one-hot matrices of the scenario-local
source/destination indices. Every term is an MXU matmul on VMEM-resident
blocks; the [E, C] messages never touch HBM and there is NO scatter op.

Why: XLA's TPU scatter executes rows serially (~14 ns/row measured); the
in-step overflow path (gather 1.3 ms + per-relation matmuls + scatter
3.8 ms per layer at 264k-edge capacity) dominated the train step. This
kernel measured 2.66 ms vs 6.16 ms for the XLA formulation at bench shapes
(256 scenarios x 896-edge plan, stride 768, C=128), before the backward
savings (the VJP's transpose scatter was another 4-5 ms/layer).

Plan arrays (built by data/packing.py alongside the pack):
  lu, lv, rel: [S*ECAP, 1] int32 — scenario-local destination row, source
  row, and relation id per planned edge; -1 marks padding. Edges beyond a
  scenario's ECAP budget spill to the classic per-relation edge lists.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import cost_model

# Relation-matmul formulation: "0" = one masked [chunk,C]x[C,C] matmul per
# relation (14 dispatches/chunk), "1" = lane-concatenate the masked copies
# and contract once as [chunk, R*C]x[R*C, C]. A/B'd on TPU v5e (see
# docs/PERFORMANCE.md): measured within noise of each other — the MXU
# pipelines the small matmuls well — so the simpler looped form ships.
_BATCHED = os.environ.get("SCEN_AGG_BATCHED", "0") == "1"


def _onehot(idx_col: jax.Array, width: int, dtype) -> jax.Array:
    """[E, 1] int32 → [E, width] one-hot (0/1 exact in bf16/f32)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], width), 1)
    return (idx_col == iota).astype(dtype)


# Edges are processed in chunks of ≤ _CHUNK inside one grid step so the
# one-hot matrices ([chunk, stride]) stay VMEM-small at large plan budgets.
_CHUNK = 512

# Relation-grouped plans need at least two chunks per window (each group's
# run is chunk-aligned); below this capacity the packer and the model both
# fall back to the single-group layout. Single source of truth for
# build_window_plan (data/packing.py) and LaneConvStack (models/map_net.py).
GROUPED_MIN_CAP = 2 * _CHUNK


def _fwd_kernel(
    num_rel, groups, nch_ref, feat_ref, temp_ref, lu_ref, lv_ref, rel_ref,
    w_ref, out_ref
):
    win = feat_ref[:]  # [stride, C]
    dt = win.dtype
    stride, c = win.shape
    ecap = lu_ref.shape[0]
    s = pl.program_id(0)
    out_ref[:] = temp_ref[:]
    # Valid plan slots are prefix-dense per window AND per relation GROUP
    # (the packer chunk-aligns each group's run — build_window_plan), so a
    # chunk runs only its group's relation matmuls: with left/right ~50% of
    # plan edges, the per-chunk relation work drops from 14 masked matmuls
    # to 2 on half the chunks (round-5 VERDICT #1/#2: the relation masking
    # was half the kernel's 27-31x MAC inflation). nch_ref[s, g] holds the
    # CUMULATIVE chunk boundary of group g; all-padding chunks skip
    # entirely as before.
    for ck, c0 in enumerate(range(0, ecap, _CHUNK)):
        c1 = min(c0 + _CHUNK, ecap)
        for gi, grp in enumerate(groups):
            hi = nch_ref[s, gi]
            cond = (ck < hi) if gi == 0 else jnp.logical_and(
                ck >= nch_ref[s, gi - 1], ck < hi
            )

            @pl.when(cond)
            def _(c0=c0, c1=c1, grp=grp):
                lv = lv_ref[c0:c1]  # [chunk, 1]
                lu = lu_ref[c0:c1]
                rel = rel_ref[c0:c1]
                gath = jnp.dot(
                    _onehot(lv, stride, dt), win, preferred_element_type=jnp.float32
                ).astype(dt)  # [chunk, C]
                if _BATCHED:
                    # All relations in ONE matmul: lane-concatenate the masked
                    # copies, contract against the vertically-stacked weights —
                    # Σ_r (gath ⊙ m_r) @ W_r == concat_r(gath ⊙ m_r) @
                    # vstack_r(W_r).  (Batched mode requires the single-group
                    # layout — asserted in _pallas_fwd.)
                    gath_stack = jnp.concatenate(
                        [gath * (rel == r).astype(dt) for r in range(num_rel)], axis=1
                    )
                    msg = jnp.dot(
                        gath_stack,
                        w_ref[:].reshape(num_rel * c, c),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    msg = jnp.zeros((gath.shape[0], c), jnp.float32)
                    for r in grp:
                        m = (rel == r).astype(dt)
                        msg += jnp.dot(
                            gath * m, w_ref[r], preferred_element_type=jnp.float32
                        )
                # Scatter one-hot: S_u[w, e] = [lu[e] == w].
                s_u = (
                    jnp.transpose(lu)
                    == jax.lax.broadcasted_iota(jnp.int32, (stride, lu.shape[0]), 0)
                ).astype(dt)
                out_ref[:] = (
                    out_ref[:].astype(jnp.float32)
                    + jnp.dot(s_u, msg.astype(dt), preferred_element_type=jnp.float32)
                ).astype(out_ref.dtype)


def _bwd_kernel(
    num_rel,
    groups,
    nch_ref,
    feat_ref,
    g_ref,
    lu_ref,
    lv_ref,
    rel_ref,
    w_t_ref,
    dfeat_ref,
    dw_ref,
):
    win = feat_ref[:]
    g_win = g_ref[:]
    dt = win.dtype
    stride, c = win.shape
    ecap = lu_ref.shape[0]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dfeat_ref[:] = jnp.zeros(win.shape, dfeat_ref.dtype)
    for ck, c0 in enumerate(range(0, ecap, _CHUNK)):
        c1 = min(c0 + _CHUNK, ecap)
        for gi, grp in enumerate(groups):
            hi = nch_ref[s, gi]
            cond = (ck < hi) if gi == 0 else jnp.logical_and(
                ck >= nch_ref[s, gi - 1], ck < hi
            )

            @pl.when(cond)
            def _(c0=c0, c1=c1, grp=grp):
                lv = lv_ref[c0:c1]
                lu = lu_ref[c0:c1]
                rel = rel_ref[c0:c1]
                # d_msg[e] = g[lu[e]] — gather one-hot on the destination side.
                d_msg = jnp.dot(
                    _onehot(lu, stride, dt), g_win, preferred_element_type=jnp.float32
                ).astype(dt)
                gath = jnp.dot(
                    _onehot(lv, stride, dt), win, preferred_element_type=jnp.float32
                ).astype(dt)
                # Relation masks are row-disjoint, so masking one side suffices:
                #   dW_r = (gath ⊙ m_r)ᵀ @ d_msg;  d_gath = Σ_r (d_msg ⊙ m_r) @ W_rᵀ
                # w_t_ref holds the per-relation transposes (hoisted to the
                # caller so the kernel never transposes).
                if _BATCHED:
                    gath_stack = jnp.concatenate(
                        [gath * (rel == r).astype(dt) for r in range(num_rel)], axis=1
                    )
                    dw_ref[:] += jax.lax.dot_general(
                        gath_stack,
                        d_msg,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(num_rel, c, c)
                    dmsg_stack = jnp.concatenate(
                        [d_msg * (rel == r).astype(dt) for r in range(num_rel)], axis=1
                    )
                    d_gath = jnp.dot(
                        dmsg_stack,
                        w_t_ref[:].reshape(num_rel * c, c),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    d_gath = jnp.zeros(gath.shape, jnp.float32)
                    for r in grp:
                        m = (rel == r).astype(dt)
                        dw_ref[r] += jax.lax.dot_general(
                            gath * m,
                            d_msg,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        d_gath += jnp.dot(
                            d_msg * m, w_t_ref[r], preferred_element_type=jnp.float32
                        )
                # d_win += G_vᵀ @ d_gath — scatter one-hot on the source side.
                s_v = (
                    jnp.transpose(lv)
                    == jax.lax.broadcasted_iota(jnp.int32, (stride, lv.shape[0]), 0)
                ).astype(dt)
                dfeat_ref[:] = (
                    dfeat_ref[:].astype(jnp.float32)
                    + jnp.dot(s_v, d_gath.astype(dt), preferred_element_type=jnp.float32)
                ).astype(dfeat_ref.dtype)


def _geometry(n: int, ecap_total: int, num_scen: int):
    assert n % num_scen == 0 and ecap_total % num_scen == 0, (n, ecap_total, num_scen)
    return n // num_scen, ecap_total // num_scen


def _group_chunk_ends(lu, rel, num_scen, ecap, groups):
    """[S, G] int32 CUMULATIVE per-window chunk boundaries per relation
    group. Valid slots are prefix-dense per window and chunk-aligned per
    group (build_window_plan's invariant), so group g occupies chunks
    [ends[s, g-1], ends[s, g]); all-padding chunks are skipped in-kernel
    via scalar prefetch."""
    valid = (lu >= 0).reshape(num_scen, ecap)
    relw = rel.reshape(num_scen, ecap)
    ends = []
    total = jnp.zeros((num_scen,), jnp.int32)
    for grp in groups:
        m = valid
        if len(groups) > 1:
            sel = relw == grp[0]
            for r in grp[1:]:
                sel = jnp.logical_or(sel, relw == r)
            m = jnp.logical_and(valid, sel)
        cnt = jnp.sum(m, axis=1, dtype=jnp.int32)
        total = total + (cnt + _CHUNK - 1) // _CHUNK
        ends.append(total)
    return jnp.stack(ends, axis=1)


def _pallas_fwd(num_scen, groups, interpret, feat, temp, w_rel, lu, lv, rel):
    from jax.experimental.pallas import tpu as pltpu

    n, c = feat.shape
    stride, ecap = _geometry(n, lu.shape[0], num_scen)
    r = w_rel.shape[0]
    if groups is None:
        groups = (tuple(range(r)),)
    assert not (_BATCHED and len(groups) > 1), "SCEN_AGG_BATCHED needs 1 group"
    cost_model.record("scenario_agg", "fwd", s=num_scen, stride=stride,
                      ecap=ecap, c=c, r=r, db=feat.dtype.itemsize,
                      groups=tuple(tuple(g) for g in groups))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_scen,),
        in_specs=[
            pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
            pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((r, c, c), lambda s, nch: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, r, groups),
        out_shape=jax.ShapeDtypeStruct((n, c), temp.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        # >4 unrolled chunks push the one-hot intermediates past Mosaic's
        # 16M scoped-vmem default (v5e has 128M physical VMEM).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(_group_chunk_ends(lu, rel, num_scen, ecap, groups),
      feat, temp, lu, lv, rel, w_rel)


def _pallas_bwd(num_scen, groups, interpret, feat, g, w_rel, lu, lv, rel):
    from jax.experimental.pallas import tpu as pltpu

    n, c = feat.shape
    stride, ecap = _geometry(n, lu.shape[0], num_scen)
    r = w_rel.shape[0]
    if groups is None:
        groups = (tuple(range(r)),)
    cost_model.record("scenario_agg", "bwd", s=num_scen, stride=stride,
                      ecap=ecap, c=c, r=r, db=feat.dtype.itemsize,
                      groups=tuple(tuple(g) for g in groups))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_scen,),
        in_specs=[
            pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
            pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((ecap, 1), lambda s, nch: (s, 0)),
            pl.BlockSpec((r, c, c), lambda s, nch: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((stride, c), lambda s, nch: (s, 0)),
            pl.BlockSpec((r, c, c), lambda s, nch: (0, 0, 0)),
        ),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, r, groups),
        out_shape=(
            jax.ShapeDtypeStruct((n, c), feat.dtype),
            jax.ShapeDtypeStruct((r, c, c), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        _group_chunk_ends(lu, rel, num_scen, ecap, groups),
        feat,
        g,
        lu,
        lv,
        rel,
        jnp.transpose(w_rel, (0, 2, 1)),
    )


def xla_reference(feat, temp, w_rel, lu, lv, rel, num_scen: int):
    """Differentiable XLA formulation of the same contraction (CPU fallback
    and the parity oracle for the Pallas kernels)."""
    n, c = feat.shape
    stride, ecap = _geometry(n, lu.shape[0], num_scen)
    base = jnp.repeat(jnp.arange(num_scen, dtype=jnp.int32) * stride, ecap)
    lu_f = lu[:, 0]
    lv_f = lv[:, 0]
    rel_f = rel[:, 0]
    valid = lu_f >= 0
    u_glob = jnp.where(valid, lu_f + base, n)
    v_glob = jnp.where(valid, lv_f + base, 0)
    src = jnp.take(feat, v_glob, axis=0)
    src = jnp.where(valid[:, None], src, 0)
    msg = jnp.zeros((lu.shape[0], c), jnp.float32)
    for r in range(w_rel.shape[0]):
        m = (rel_f == r)[:, None]
        msg += jnp.where(
            m, jnp.dot(src, w_rel[r], preferred_element_type=jnp.float32), 0
        )
    out = jnp.zeros((n, c), jnp.float32).at[u_glob].add(msg, mode="drop")
    return temp + out.astype(temp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _scenario_agg_p(feat, temp, w_rel, lu, lv, rel, num_scen, groups, interpret):
    return _pallas_fwd(num_scen, groups, interpret, feat, temp, w_rel, lu, lv, rel)


def _agg_fwd(feat, temp, w_rel, lu, lv, rel, num_scen, groups, interpret):
    out = _pallas_fwd(num_scen, groups, interpret, feat, temp, w_rel, lu, lv, rel)
    return out, (feat, w_rel, lu, lv, rel)


def _agg_bwd(num_scen, groups, interpret, res, g):
    feat, w_rel, lu, lv, rel = res
    dfeat, dw = _pallas_bwd(num_scen, groups, interpret, feat, g, w_rel, lu, lv, rel)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dfeat, g, dw.astype(w_rel.dtype), f0(lu), f0(lv), f0(rel))


_scenario_agg_p.defvjp(_agg_fwd, _agg_bwd)


def scenario_aggregate(
    feat: jax.Array,  # [N, C] node features (strided layout)
    temp: jax.Array,  # [N, C] accumulator (result = temp + aggregate)
    w_rel: jax.Array,  # [R, C, C] per-relation weights
    lu: jax.Array,  # [S*ECAP, 1] int32 scenario-local destinations (-1 pad)
    lv: jax.Array,  # [S*ECAP, 1] int32 scenario-local sources
    rel: jax.Array,  # [S*ECAP, 1] int32 relation ids
    num_scen: int,
    mode: str = "on",  # "on" | "interpret" | "xla"
    groups: tuple | None = None,
) -> jax.Array:
    """temp + Σ planned edges W_rel[rel] · feat[src] scattered to dst.

    Gradients flow to feat, temp, and w_rel (hand-written VJP; both
    directions are scenario-blocked Pallas kernels — no XLA scatter).

    groups: optional tuple of relation-id tuples. REQUIRES the plan to be
    chunk-aligned per group (build_window_plan emits this layout): each
    window's slots hold group 0's edges first, padded to a _CHUNK
    multiple, then group 1's, etc. Chunks then run only their group's
    relation matmuls. An unaligned plan under groups SILENTLY DROPS the
    out-of-group edges — pinned by tests/test_scenario_agg.py.
    """
    if mode == "xla":
        return xla_reference(feat, temp, w_rel, lu, lv, rel, num_scen)
    return _scenario_agg_p(
        feat, temp, w_rel, lu, lv, rel, int(num_scen), groups,
        mode == "interpret"
    )
