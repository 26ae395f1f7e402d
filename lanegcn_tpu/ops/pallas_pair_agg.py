"""Pallas TPU kernel: window-pair LaneConv aggregation (the spill plan).

The scenario-window plan (ops/pallas_scenario_agg) covers overflow edges
whose endpoints share ONE stride-window; its residue — straddling
scenarios' cross-window edges and per-window budget overflow — previously
went through masked gather + XLA scatter-add lists (~25k edges/pack on the
urban bench, ~10 ms/step across 8 layers: reference lanegcn.py:329-362
runs this whole class of edges as CUDA index_add_). This kernel runs that
residue with the same one-hot MXU formulation, generalized to
(destination-window, source-window) CHUNK PAIRS (data/packing.py
build_pair_plan with a relation column):

    out_dwin += Σ_r S_u @ ((G_v @ feat_swin) ⊙ m_r) @ W_r

per chunk, with the destination block VMEM-resident across its
consecutive chunks (plan sorted by (dwin, swin)). The backward mirrors
ops/pallas_win_edge's two passes: a dwin-sorted pass accumulates dW and
saves the per-edge source cotangents d_gath to HBM; an swin-sorted pass
(plan.sperm) scatters them into dfeat. Both accumulate into aliased
buffers with first-flag initialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import cost_model


def _onehot(idx_col: jax.Array, width: int, dtype) -> jax.Array:
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], width), 1)
    return (idx_col == iota).astype(dtype)


def _edge_contract(oh, rows, dtype):
    return jax.lax.dot_general(
        oh, rows.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(num_rel,
                dwin_r, swin_r, first_r, nv_r,
                feat_ref, temp_ref, lu_ref, lv_ref, rel_ref, w_ref, out_ref):
    k = pl.program_id(0)
    dt = feat_ref.dtype
    sd = temp_ref.shape[0]
    ss = feat_ref.shape[0]

    @pl.when(first_r[k] == 1)
    def _():
        out_ref[:] = temp_ref[:]

    @pl.when(nv_r[k] > 0)
    def _():
        lu = lu_ref[:]
        lv = lv_ref[:]
        rel = rel_ref[:]
        gath = jnp.dot(
            _onehot(lv, ss, dt), feat_ref[:], preferred_element_type=jnp.float32
        ).astype(dt)
        msg = jnp.zeros((gath.shape[0], gath.shape[1]), jnp.float32)
        for r in range(num_rel):
            m = (rel == r).astype(dt)
            msg += jnp.dot(gath * m, w_ref[r], preferred_element_type=jnp.float32)
        out_ref[:] = (
            out_ref[:].astype(jnp.float32)
            + _edge_contract(_onehot(lu, sd, dt), msg.astype(dt), dt)
        ).astype(out_ref.dtype)


def _bwd_d_kernel(num_rel,
                  dwin_r, swin_r, first_r, nv_r,
                  feat_ref, g_ref, lu_ref, lv_ref, rel_ref, w_t_ref,
                  dw_ref, dg_ref):
    """dwin-sorted pass: dW accumulation + per-edge d_gath saves."""
    k = pl.program_id(0)
    dt = feat_ref.dtype
    sd = g_ref.shape[0]
    ss = feat_ref.shape[0]

    @pl.when(k == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(nv_r[k] > 0)
    def _():
        lu = lu_ref[:]
        lv = lv_ref[:]
        rel = rel_ref[:]
        d_msg = jnp.dot(
            _onehot(lu, sd, dt), g_ref[:].astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        gath = jnp.dot(
            _onehot(lv, ss, dt), feat_ref[:], preferred_element_type=jnp.float32
        ).astype(dt)
        d_gath = jnp.zeros(gath.shape, jnp.float32)
        for r in range(num_rel):
            m = (rel == r).astype(dt)
            dw_ref[r] += _edge_contract(gath * m, d_msg, dt)
            d_gath += jnp.dot(
                d_msg * m, w_t_ref[r], preferred_element_type=jnp.float32
            )
        dg_ref[:] = d_gath.astype(dg_ref.dtype)


def _bwd_s_kernel(sperm_r, sswin_r, sfirst_r, snv_r,
                  dg_ref, lv_ref, z_ref, dfeat_ref):
    """swin-sorted pass: scatter the saved d_gath into dfeat."""
    k = pl.program_id(0)
    dt = dg_ref.dtype
    ss = dfeat_ref.shape[0]

    @pl.when(sfirst_r[k] == 1)
    def _():
        dfeat_ref[:] = z_ref[:]

    @pl.when(snv_r[k] > 0)
    def _():
        oh_v = _onehot(lv_ref[:], ss, dt)
        dfeat_ref[:] = (
            dfeat_ref[:].astype(jnp.float32)
            + _edge_contract(oh_v, dg_ref[:], dt)
        ).astype(dfeat_ref.dtype)


def _nv(lu, nc, ch):
    return jnp.sum((lu[:, 0] >= 0).reshape(nc, ch).astype(jnp.int32), axis=1)


def _pallas_fwd(plan, interpret, feat, temp, w_rel):
    from jax.experimental.pallas import tpu as pltpu

    n, c = feat.shape
    sd, ss, ch = plan.dst_stride, plan.src_stride, plan.chunk
    nc = plan.dwin.shape[0]
    r = w_rel.shape[0]
    cost_model.record("pair_agg", "fwd", nc=nc, chunk=ch, sd=sd, ss=ss, c=c,
                      r=r, db=feat.dtype.itemsize)
    nv = _nv(plan.lu, nc, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ss, c), lambda k, d, s, f, v: (s[k], 0)),   # feat src
            pl.BlockSpec((sd, c), lambda k, d, s, f, v: (d[k], 0)),   # temp
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # lu
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # lv
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # rel
            pl.BlockSpec((r, c, c), lambda k, d, s, f, v: (0, 0, 0)),  # w
        ],
        out_specs=pl.BlockSpec((sd, c), lambda k, d, s, f, v: (d[k], 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, r),
        out_shape=jax.ShapeDtypeStruct((n, c), temp.dtype),
        grid_spec=grid_spec,
        input_output_aliases={5: 0},  # temp (4 prefetch + feat)
        interpret=interpret,
    )(plan.dwin, plan.swin, plan.first, nv,
      feat, temp, plan.lu, plan.lv, plan.rel, w_rel)


def _pallas_bwd(plan, interpret, feat, g, w_rel):
    from jax.experimental.pallas import tpu as pltpu

    n, c = feat.shape
    sd, ss, ch = plan.dst_stride, plan.src_stride, plan.chunk
    nc = plan.dwin.shape[0]
    r = w_rel.shape[0]
    cost_model.record("pair_agg", "bwd_d", nc=nc, chunk=ch, sd=sd, ss=ss, c=c,
                      r=r, db=feat.dtype.itemsize)
    cost_model.record("pair_agg", "bwd_s", nc=nc, chunk=ch, sd=sd, ss=ss, c=c,
                      r=r, db=feat.dtype.itemsize)
    nv = _nv(plan.lu, nc, ch)
    d_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ss, c), lambda k, d, s, f, v: (s[k], 0)),   # feat src
            pl.BlockSpec((sd, c), lambda k, d, s, f, v: (d[k], 0)),   # g
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # lu
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # lv
            pl.BlockSpec((ch, 1), lambda k, d, s, f, v: (k, 0)),      # rel
            pl.BlockSpec((r, c, c), lambda k, d, s, f, v: (0, 0, 0)),  # w_t
        ],
        out_specs=(
            pl.BlockSpec((r, c, c), lambda k, d, s, f, v: (0, 0, 0)),  # dw
            pl.BlockSpec((ch, c), lambda k, d, s, f, v: (k, 0)),       # d_gath
        ),
    )
    dw, dg = pl.pallas_call(
        functools.partial(_bwd_d_kernel, r),
        out_shape=(
            jax.ShapeDtypeStruct((r, c, c), jnp.float32),
            jax.ShapeDtypeStruct((nc * ch, c), feat.dtype),
        ),
        grid_spec=d_grid,
        interpret=interpret,
    )(plan.dwin, plan.swin, plan.first, nv,
      feat, g.astype(feat.dtype), plan.lu, plan.lv, plan.rel,
      jnp.transpose(w_rel, (0, 2, 1)))

    zeros = jnp.zeros((n, c), feat.dtype)
    snv = jnp.take(nv, plan.sperm)
    s_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ch, c), lambda k, p, s, f, v: (p[k], 0)),   # d_gath
            pl.BlockSpec((ch, 1), lambda k, p, s, f, v: (p[k], 0)),   # lv
            pl.BlockSpec((ss, c), lambda k, p, s, f, v: (s[k], 0)),   # zeros
        ],
        out_specs=pl.BlockSpec((ss, c), lambda k, p, s, f, v: (s[k], 0)),
    )
    dfeat = pl.pallas_call(
        _bwd_s_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), feat.dtype),
        grid_spec=s_grid,
        input_output_aliases={6: 0},  # zeros (4 prefetch + dg + lv)
        interpret=interpret,
    )(plan.sperm, plan.sswin, plan.sfirst, snv, dg, plan.lv, zeros)
    return dfeat, dw


def xla_reference(feat, temp, w_rel, plan):
    """Differentiable XLA formulation (CPU fallback + parity oracle)."""
    n, c = feat.shape
    ch = plan.chunk
    lu = plan.lu[:, 0]
    lv = plan.lv[:, 0]
    rel = plan.rel[:, 0]
    e_tot = lu.shape[0]
    ch_idx = jnp.arange(e_tot, dtype=jnp.int32) // ch
    valid = lu >= 0
    u_glob = jnp.where(valid, plan.dwin[ch_idx] * plan.dst_stride + lu, n)
    v_glob = jnp.where(valid, plan.swin[ch_idx] * plan.src_stride + lv, 0)
    src = jnp.take(feat, jnp.clip(v_glob, 0, n - 1), axis=0)
    src = jnp.where(valid[:, None], src, 0)
    msg = jnp.zeros((e_tot, c), jnp.float32)
    for r in range(w_rel.shape[0]):
        m = (rel == r)[:, None]
        msg += jnp.where(
            m, jnp.dot(src, w_rel[r], preferred_element_type=jnp.float32), 0
        )
    out = jnp.zeros((n, c), jnp.float32).at[u_glob].add(msg, mode="drop")
    return temp + out.astype(temp.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pair_agg_p(feat, temp, w_rel, idx, meta, chunk, sd, ss, interpret):
    plan = _mk(idx, meta, chunk, sd, ss)
    return _pallas_fwd(plan, interpret, feat, temp, w_rel)


def _mk(idx, meta, chunk, sd, ss):
    from types import SimpleNamespace

    return SimpleNamespace(
        lu=idx[:, 0:1], lv=idx[:, 1:2], rel=idx[:, 2:3],
        dwin=meta[0], swin=meta[1], first=meta[2],
        sperm=meta[3], sswin=meta[4], sfirst=meta[5],
        chunk=chunk, dst_stride=sd, src_stride=ss,
    )


def _vjp_fwd(feat, temp, w_rel, idx, meta, chunk, sd, ss, interpret):
    plan = _mk(idx, meta, chunk, sd, ss)
    out = _pallas_fwd(plan, interpret, feat, temp, w_rel)
    return out, (feat, w_rel, idx, meta)


def _vjp_bwd(chunk, sd, ss, interpret, res, g):
    feat, w_rel, idx, meta = res
    plan = _mk(idx, meta, chunk, sd, ss)
    dfeat, dw = _pallas_bwd(plan, interpret, feat, g, w_rel)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dfeat, g, dw.astype(w_rel.dtype), f0(idx), f0(meta))


_pair_agg_p.defvjp(_vjp_fwd, _vjp_bwd)


def pair_aggregate(feat, temp, w_rel, plan, mode="on"):
    """temp + Σ spill-plan edges W_rel[rel] · feat[src] scattered to dst.

    feat/temp [N, C]; w_rel [R, C, C]; plan: graph.PairPlan with the
    relation column (idx width 3). Gradients flow to feat, temp, w_rel.
    mode: "on" | "interpret" | "xla".
    """
    if mode == "xla":
        return xla_reference(feat, temp, w_rel, plan)
    return _pair_agg_p(
        feat, temp, w_rel, plan.idx, plan.meta,
        int(plan.chunk), int(plan.dst_stride), int(plan.src_stride),
        mode == "interpret",
    )
