"""Pallas TPU kernel: fused residual layer tail.

One kernel computes, per row tile,

    h   = relu(GN1(x))          (row-local, single group)
    z   = h @ W                 (MXU)
    out = relu(GN2(z) + res)    (residual)

— the `relu(GroupNorm) → Linear(act=False) → relu(+res)` tail every Att
stage (models/fusion.py, reference lanegcn.py:704-710) runs after its
edge aggregation.  Unfused, the chain is 4 XLA ops with [A, C] HBM
round-trips between them; fused, x/res are read once and out written
once, with GN statistics, h and z living in VMEM.

The hand-written VJP saves only the layer inputs: it recomputes the
forward per tile (one [t, C] x [C, C] matmul), applies both GroupNorm
backwards in-register (torch semantics: biased variance, eps inside
rsqrt), and accumulates dW/dGN across sequential grid steps into
revisited blocks — the same pattern as ops/pallas_lane_layer.py.

The cotangent of `res` equals the post-mask output cotangent (out is
relu(y + res)), so the backward emits it once and the VJP returns the
same array for both.

Parity with the unfused XLA formulation is pinned by
tests/test_row_tail.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _chain(x_ref, w_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref, eps):
    xf = x_ref[:, :].astype(jnp.float32)
    g1w = g1w_ref[0:1, :].astype(jnp.float32)
    g1b = g1b_ref[0:1, :].astype(jnp.float32)
    g2w = g2w_ref[0:1, :].astype(jnp.float32)
    g2b = g2b_ref[0:1, :].astype(jnp.float32)
    nrm1, inv1, h_pre = _gn_fwd(xf, g1w, g1b, eps)
    h = jnp.maximum(h_pre, 0.0).astype(x_ref.dtype)
    z = jax.lax.dot_general(
        h, w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    nrm2, inv2, y = _gn_fwd(z, g2w, g2b, eps)
    return nrm1, inv1, h_pre, h, nrm2, inv2, y


def _fwd_kernel(eps, x_ref, res_ref, w_ref, g1w_ref, g1b_ref, g2w_ref,
                g2b_ref, o_ref):
    *_, y = _chain(x_ref, w_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref, eps)
    resf = res_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = jnp.maximum(y + resf, 0.0).astype(o_ref.dtype)


def _bwd_kernel(eps, x_ref, res_ref, g_ref, w_ref, g1w_ref, g1b_ref,
                g2w_ref, g2b_ref, dx_ref, dy_ref, dw_ref, dgn_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        dgn_ref[:, :] = jnp.zeros_like(dgn_ref)

    nrm1, inv1, h_pre, h, nrm2, inv2, y = _chain(
        x_ref, w_ref, g1w_ref, g1b_ref, g2w_ref, g2b_ref, eps
    )
    g1w = g1w_ref[0:1, :].astype(jnp.float32)
    g2w = g2w_ref[0:1, :].astype(jnp.float32)
    resf = res_ref[:, :].astype(jnp.float32)
    out_mask = ((y + resf) > 0.0).astype(jnp.float32)

    d_y = g_ref[:, :].astype(jnp.float32) * out_mask
    d_z = _gn_bwd(d_y, nrm2, inv2, g2w)
    d_h = jax.lax.dot_general(
        d_z.astype(x_ref.dtype), w_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),  # @ Wᵀ
        preferred_element_type=jnp.float32,
    ) * (h_pre > 0.0).astype(jnp.float32)
    dx = _gn_bwd(d_h, nrm1, inv1, g1w)

    dw_ref[:, :] += jax.lax.dot_general(
        h, d_z.astype(x_ref.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgn_ref[0:1, :] += jnp.sum(d_h * nrm1, axis=0, keepdims=True)
    dgn_ref[1:2, :] += jnp.sum(d_h, axis=0, keepdims=True)
    dgn_ref[2:3, :] += jnp.sum(d_y * nrm2, axis=0, keepdims=True)
    dgn_ref[3:4, :] += jnp.sum(d_y, axis=0, keepdims=True)

    dx_ref[:, :] = dx.astype(dx_ref.dtype)
    dy_ref[:, :] = d_y.astype(dy_ref.dtype)


def _row(p):
    return p.reshape(1, -1)


def _tile(n: int) -> int:
    return 1024 if n >= 1024 else 256


_PARAM_SPECS = lambda c: [
    pl.BlockSpec((c, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
    pl.BlockSpec((1, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
]


def _fwd_impl(x, res, w, g1w, g1b, g2w, g2b, eps, interpret):
    n, c = x.shape
    t = _tile(n)
    row = pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=(n // t,),
        in_specs=[row, row] + _PARAM_SPECS(c),
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=interpret,
    )(x, res, w, _row(g1w), _row(g1b), _row(g2w), _row(g2b))


def _bwd_impl(x, res, w, g1w, g1b, g2w, g2b, g_out, eps, interpret):
    n, c = x.shape
    t = _tile(n)
    row = pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM)
    acc = lambda r: pl.BlockSpec((r, c), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        grid=(n // t,),
        in_specs=[row, row, row] + _PARAM_SPECS(c),
        out_specs=[row, row, acc(c), acc(8)],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, res, g_out.astype(x.dtype), w, _row(g1w), _row(g1b),
      _row(g2w), _row(g2b))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _row_tail_p(x, res, w, g1w, g1b, g2w, g2b, eps, interpret):
    return _fwd_impl(x, res, w, g1w, g1b, g2w, g2b, eps, interpret)


def _vjp_fwd(x, res, w, g1w, g1b, g2w, g2b, eps, interpret):
    out = _fwd_impl(x, res, w, g1w, g1b, g2w, g2b, eps, interpret)
    return out, (x, res, w, g1w, g1b, g2w, g2b)


def _vjp_bwd(eps, interpret, saved, g_out):
    x, res, w, g1w, g1b, g2w, g2b = saved
    dx, d_y, dw, dgn = _bwd_impl(x, res, w, g1w, g1b, g2w, g2b, g_out,
                                 eps, interpret)
    return (
        dx,
        d_y,  # d res: out = relu(y + res), so dres == the masked cotangent
        dw.astype(w.dtype),
        dgn[0].astype(g1w.dtype),
        dgn[1].astype(g1b.dtype),
        dgn[2].astype(g2w.dtype),
        dgn[3].astype(g2b.dtype),
    )


_row_tail_p.defvjp(_vjp_fwd, _vjp_bwd)


def xla_reference(x, res, w, g1w, g1b, g2w, g2b, eps=1e-5):
    """Unfused formulation (matches models/fusion.py Att tail exactly)."""
    from .norm import group_norm

    h = group_norm(x.astype(jnp.float32), g1w, g1b, 1, eps).astype(x.dtype)
    h = jnp.maximum(h, 0)
    z = jnp.dot(h, w.astype(x.dtype))
    y = group_norm(z.astype(jnp.float32), g2w, g2b, 1, eps).astype(x.dtype)
    return jnp.maximum(y + res, 0)


def fused_row_tail(x, res, w, g1w, g1b, g2w, g2b, eps=1e-5, mode="auto"):
    """relu(GN2(relu(GN1(x)) @ w) + res), single-group GroupNorms.

    x/res [N, C] (any N; rows are padded to the tile internally),
    w [C, C], affines [C].  mode: "auto" | "on" | "interpret" | "xla".
    """
    if mode == "auto":
        mode = "on" if jax.default_backend() in ("tpu", "axon") else "xla"
    if mode == "xla":
        return xla_reference(x, res, w, g1w, g1b, g2w, g2b, eps)
    n, c = x.shape
    t = _tile(n)
    pad = (-n) % t
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        res = jnp.pad(res, ((0, pad), (0, 0)))
    out = _row_tail_p(x, res, w, g1w, g1b, g2w, g2b, eps, mode == "interpret")
    return out[:n] if pad else out
