"""Pallas TPU kernel: fused fusion-stage edge MLP (Att / LanePooling).

The Att edge chain (reference lanegcn.py:693-700) and the LanePooling edge
chain (reference lanercnn.py:497-505) are per-edge maps

    t1 = relu(d @ Wd + bd)                      # dist/rel-pose embed
    t2 = relu(GN(t1 @ Wdo))                     # Att only (dist_out Linear)
    s  = t2 @ K1 + qg (+ cg)                    # add gathered projections
    e1 = relu(GN(s))                            # SplitLinear norm
    e2 = e1 @ Wout                              # ctx_out Dense

where every stage is row-local (GroupNorm has ng=1 ⇒ per-row over
channels). Unfused, the [E, C] intermediates t1/t2/s/e1 each round-trip
HBM; this kernel keeps the whole chain in VMEM per edge tile, reading only
d/qg/cg and writing only e2. The destination scatter stays in XLA
(sorted-index segment add).

Padding edges need no masking here: their inputs are zeros, so their e2 is
a data-independent constant row that the masked scatter drops, and their
incoming cotangent is zero (scatter's VJP applies the mask), so parameter
gradients see no padding contribution — exactly the unfused semantics.

The custom VJP recomputes the forward per tile (nothing but layer inputs
is saved) and accumulates parameter gradients across sequential grid steps
into revisited output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cost_model

_TILE = 512


def _gn_fwd(t, w, b, eps):
    mu = jnp.mean(t, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(t - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    nrm = (t - mu) * inv
    return nrm, inv, nrm * w + b


def _gn_bwd(d_y, nrm, inv, w):
    d_nrm = d_y * w
    c1 = jnp.mean(d_nrm, axis=1, keepdims=True)
    c2 = jnp.mean(d_nrm * nrm, axis=1, keepdims=True)
    return inv * (d_nrm - c1 - nrm * c2)


def _mm(a, b, dtype, transpose_b=False):
    dims = (((1,), (1,)), ((), ())) if transpose_b else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=dims, preferred_element_type=jnp.float32,
    )


def _chain_fwd(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, eps,
               has_dist2, has_query, dtype):
    """Shared forward recompute; returns intermediates for the backward."""
    t1_pre = _mm(d, kd, dtype) + bd.astype(jnp.float32)
    t1 = jnp.maximum(t1_pre, 0.0)
    if has_dist2:
        z = _mm(t1.astype(dtype), kdo, dtype)
        nrm_z, inv_z, t2_pre = _gn_fwd(z, gdow, gdob, eps)
        t2 = jnp.maximum(t2_pre, 0.0)
    else:
        nrm_z = inv_z = t2_pre = None
        t2 = t1
    s = _mm(t2.astype(dtype), k1, dtype) + cg.astype(jnp.float32)
    if has_query:
        s = s + qg.astype(jnp.float32)
    nrm_s, inv_s, e1_pre = _gn_fwd(s, gchw, gchb, eps)
    e1 = jnp.maximum(e1_pre, 0.0)
    return t1, t1_pre, t2, t2_pre, nrm_z, inv_z, e1, e1_pre, nrm_s, inv_s


def _fwd_kernel(eps, has_dist2, has_query, d_ref, qg_ref, cg_ref, kd_ref,
                bd_ref, kdo_ref, gdo_ref, k1_ref, gch_ref, kout_ref, o_ref):
    dtype = cg_ref.dtype
    qg = qg_ref[:, :] if has_query else None
    gdow = gdo_ref[0:1, :].astype(jnp.float32)
    gdob = gdo_ref[1:2, :].astype(jnp.float32)
    *_, e1, _, _, _ = _chain_fwd(
        d_ref[:, :], qg, cg_ref[:, :], kd_ref[:, :], bd_ref[0:1, :],
        kdo_ref[:, :], gdow, gdob, k1_ref[:, :],
        gch_ref[0:1, :].astype(jnp.float32), gch_ref[1:2, :].astype(jnp.float32),
        eps, has_dist2, has_query, dtype,
    )
    o_ref[:, :] = _mm(e1.astype(dtype), kout_ref[:, :], dtype).astype(o_ref.dtype)


def _bwd_kernel(eps, has_dist2, has_query, d_ref, qg_ref, cg_ref, kd_ref,
                bd_ref, kdo_ref, gdo_ref, k1_ref, gch_ref, kout_ref, g_ref,
                dd_ref, dqg_ref, dcg_ref, dkd_ref, dbd_ref, dkdo_ref,
                dgdo_ref, dk1_ref, dgch_ref, dkout_ref):
    dtype = cg_ref.dtype
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dkd_ref[:, :] = jnp.zeros_like(dkd_ref)
        dbd_ref[:, :] = jnp.zeros_like(dbd_ref)
        dkdo_ref[:, :] = jnp.zeros_like(dkdo_ref)
        dgdo_ref[:, :] = jnp.zeros_like(dgdo_ref)
        dk1_ref[:, :] = jnp.zeros_like(dk1_ref)
        dgch_ref[:, :] = jnp.zeros_like(dgch_ref)
        dkout_ref[:, :] = jnp.zeros_like(dkout_ref)

    d = d_ref[:, :]
    qg = qg_ref[:, :] if has_query else None
    gdow = gdo_ref[0:1, :].astype(jnp.float32)
    gdob = gdo_ref[1:2, :].astype(jnp.float32)
    gchw = gch_ref[0:1, :].astype(jnp.float32)
    gchb = gch_ref[1:2, :].astype(jnp.float32)
    t1, t1_pre, t2, t2_pre, nrm_z, inv_z, e1, e1_pre, nrm_s, inv_s = _chain_fwd(
        d, qg, cg_ref[:, :], kd_ref[:, :], bd_ref[0:1, :], kdo_ref[:, :],
        gdow, gdob, k1_ref[:, :], gchw, gchb, eps, has_dist2, has_query, dtype,
    )

    if not has_query:
        @pl.when(b == 0)
        def _():
            dqg_ref[:, :] = jnp.zeros_like(dqg_ref)

    g = g_ref[:, :].astype(jnp.float32)
    # e2 = e1 @ Wout
    d_e1 = _mm(g.astype(dtype), kout_ref[:, :], dtype, transpose_b=True)
    dkout_ref[:, :] += jax.lax.dot_general(
        e1.astype(dtype), g.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # e1 = relu(GN(s))
    d_gn_s = d_e1 * (e1_pre > 0.0).astype(jnp.float32)
    dgch_ref[0:1, :] += jnp.sum(d_gn_s * nrm_s, axis=0, keepdims=True)
    dgch_ref[1:2, :] += jnp.sum(d_gn_s, axis=0, keepdims=True)
    d_s = _gn_bwd(d_gn_s, nrm_s, inv_s, gchw)
    dcg_ref[:, :] = d_s.astype(dcg_ref.dtype)
    if has_query:
        dqg_ref[:, :] = d_s.astype(dqg_ref.dtype)
    # s = t2 @ K1 + ...
    d_t2 = _mm(d_s.astype(dtype), k1_ref[:, :], dtype, transpose_b=True)
    dk1_ref[:, :] += jax.lax.dot_general(
        t2.astype(dtype), d_s.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_dist2:
        # t2 = relu(GN(t1 @ Wdo))
        d_gn_z = d_t2 * (t2_pre > 0.0).astype(jnp.float32)
        dgdo_ref[0:1, :] += jnp.sum(d_gn_z * nrm_z, axis=0, keepdims=True)
        dgdo_ref[1:2, :] += jnp.sum(d_gn_z, axis=0, keepdims=True)
        d_z = _gn_bwd(d_gn_z, nrm_z, inv_z, gdow)
        dkdo_ref[:, :] += jax.lax.dot_general(
            t1.astype(dtype), d_z.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_t1 = _mm(d_z.astype(dtype), kdo_ref[:, :], dtype, transpose_b=True)
    else:
        d_t1 = d_t2
    # t1 = relu(d @ Wd + bd)
    d_t1p = d_t1 * (t1_pre > 0.0).astype(jnp.float32)
    dbd_ref[:, :] += jnp.sum(d_t1p, axis=0, keepdims=True)
    dkd_ref[:, :] += jax.lax.dot_general(
        d.astype(dtype), d_t1p.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dd_ref[:, :] = _mm(d_t1p.astype(dtype), kd_ref[:, :], dtype, transpose_b=True).astype(dd_ref.dtype)


def _pad_rows(x, e_pad):
    return jnp.pad(x, ((0, e_pad - x.shape[0]), (0, 0)))


def _row(p):
    return p.reshape(1, -1)


def _specs(din, c, t, has_dist2, has_query):
    """(in_specs, inputs-builder) shared by fwd and bwd."""
    edge = lambda w: pl.BlockSpec((t, w), lambda b: (b, 0), memory_space=pltpu.VMEM)
    full = lambda r, w: pl.BlockSpec((r, w), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return [
        edge(din),               # d
        edge(c) if has_query else full(1, c),  # qg (dummy row when unused)
        edge(c),                 # cg
        full(din, c),            # kd
        full(1, c),              # bd
        full(c, c),              # kdo (dummy [1,c] when unused — keep full)
        full(2, c),              # gdo
        full(c, c),              # k1
        full(2, c),              # gch
        full(c, c),              # kout
    ]


def _prep(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
          has_dist2, has_query):
    e, c = cg.shape
    din = d.shape[1]
    t = _TILE
    e_pad = -(-max(e, 1) // t) * t
    d_p = _pad_rows(d, e_pad)
    cg_p = _pad_rows(cg, e_pad)
    qg_p = _pad_rows(qg, e_pad) if has_query else jnp.zeros((1, c), cg.dtype)
    if not has_dist2:
        kdo = jnp.zeros((c, c), kd.dtype)
        gdow = jnp.ones((c,), jnp.float32)
        gdob = jnp.zeros((c,), jnp.float32)
    gdo = jnp.concatenate([_row(gdow), _row(gdob)], 0)
    gch = jnp.concatenate([_row(gchw), _row(gchb)], 0)
    inputs = (d_p, qg_p, cg_p, kd, _row(bd), kdo, gdo, k1, gch, kout)
    return inputs, e, e_pad, t, din, c


def _fwd_impl(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
              has_dist2, has_query, eps, interpret):
    inputs, e, e_pad, t, din, c = _prep(
        d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
        has_dist2, has_query,
    )
    cost_model.record("edge_mlp", "fwd", e=e_pad, t=t, c=c, din=din,
                      has_query=int(has_query), has_dist2=int(has_dist2),
                      db=cg.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps, has_dist2, has_query),
        grid=(e_pad // t,),
        in_specs=_specs(din, c, t, has_dist2, has_query),
        out_specs=pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e_pad, c), cg.dtype),
        interpret=interpret,
    )(*inputs)
    return out[:e]


def _bwd_impl(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
              g_out, has_dist2, has_query, eps, interpret):
    inputs, e, e_pad, t, din, c = _prep(
        d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
        has_dist2, has_query,
    )
    cost_model.record("edge_mlp", "bwd", e=e_pad, t=t, c=c, din=din,
                      has_query=int(has_query), has_dist2=int(has_dist2),
                      db=cg.dtype.itemsize)
    g_p = _pad_rows(g_out.astype(cg.dtype), e_pad)
    edge_out = lambda w: pl.BlockSpec((t, w), lambda b: (b, 0), memory_space=pltpu.VMEM)
    acc = lambda r, w: pl.BlockSpec((r, w), lambda b: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps, has_dist2, has_query),
        grid=(e_pad // t,),
        in_specs=_specs(din, c, t, has_dist2, has_query)
        + [edge_out(c)],  # g
        out_specs=[
            edge_out(din),                        # dd
            edge_out(c) if has_query else acc(1, c),  # dqg
            edge_out(c),                          # dcg
            acc(din, c), acc(1, c), acc(c, c), acc(2, c),
            acc(c, c), acc(2, c), acc(c, c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, din), d.dtype),
            jax.ShapeDtypeStruct((e_pad, c) if has_query else (1, c), cg.dtype),
            jax.ShapeDtypeStruct((e_pad, c), cg.dtype),
            jax.ShapeDtypeStruct((din, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs, g_p)
    dd, dqg, dcg, dkd, dbd, dkdo, dgdo, dk1, dgch, dkout = outs
    return dd[:e], (dqg[:e] if has_query else None), dcg[:e], dkd, dbd[0], dkdo, dgdo, dk1, dgch, dkout


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _fused_core(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
                has_dist2, has_query, eps, interpret):
    return _fwd_impl(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb,
                     kout, has_dist2, has_query, eps, interpret)


def fused_edge_mlp(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
                   has_dist2=True, has_query=True, eps=1e-5, interpret=False):
    """Fused per-edge MLP chain; returns e2 [E, C] ready for the masked
    destination scatter. See module docstring for the chain.

    d [E, Din]; qg/cg [E, C] pre-projected gathered rows; kd [Din, C];
    bd [C]; kdo [C, C] + gdow/gdob (Att dist_out, ignored when
    has_dist2=False); k1 [C, C]; gchw/gchb (SplitLinear norm); kout [C, C].
    For LanePooling pass has_dist2=False, has_query=False, qg=None.
    """
    if qg is None:
        qg = jnp.zeros((1, cg.shape[1]), cg.dtype)
    return _fused_core(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb,
                       kout, has_dist2, has_query, eps, interpret)


def _vjp_fwd(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout,
             has_dist2, has_query, eps, interpret):
    out = _fwd_impl(d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb,
                    kout, has_dist2, has_query, eps, interpret)
    return out, (d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout)


def _vjp_bwd(has_dist2, has_query, eps, interpret, res, g_out):
    d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout = res
    dd, dqg, dcg, dkd, dbd, dkdo, dgdo, dk1, dgch, dkout = _bwd_impl(
        d, qg, cg, kd, bd, kdo, gdow, gdob, k1, gchw, gchb, kout, g_out,
        has_dist2, has_query, eps, interpret,
    )
    if dqg is None:
        dqg = jnp.zeros_like(qg)
    return (
        dd.astype(d.dtype),
        dqg,
        dcg,
        dkd.astype(kd.dtype),
        dbd.astype(bd.dtype),
        dkdo.astype(kdo.dtype),
        dgdo[0].astype(gdow.dtype),
        dgdo[1].astype(gdob.dtype),
        dk1.astype(k1.dtype),
        dgch[0].astype(gchw.dtype),
        dgch[1].astype(gchb.dtype),
        dkout.astype(kout.dtype),
    )


_fused_core.defvjp(_vjp_fwd, _vjp_bwd)
