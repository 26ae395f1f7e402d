"""Pallas TPU kernel: fused residual layer tails.

One kernel computes, per row tile, a chain of K linear stages closed by a
residual relu:

    t_0 = x
    h_i = relu(GN_i(t_{i-1}))        (row-local, single group)
    t_i = h_i @ W_i                  (MXU), i = 1..K
    out = relu(GN_{K+1}(t_K) + res)

K=1 is the `relu(GroupNorm) → Linear(act=False) → relu(+res)` tail every
Att stage (models/fusion.py, reference lanegcn.py:704-710) runs after
its edge aggregation; K=2 is LanePooling's `GN → mlp1 → mlp2 → +res`
tail (models/lanercnn.py, reference lanercnn.py:497-505).  Unfused, the
chain is 2K+2 XLA ops with [A, C] HBM round-trips between them; fused,
x/res are read once and out written once, with GN statistics, h_i and
t_i living in VMEM.

The hand-written VJP saves only the layer inputs: it recomputes the
forward per tile (K [t, C] x [C, C] matmuls), applies the GroupNorm
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

from . import cost_model


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


def _affine(gn_ref, i):
    w = gn_ref[2 * i : 2 * i + 1, :].astype(jnp.float32)
    b = gn_ref[2 * i + 1 : 2 * i + 2, :].astype(jnp.float32)
    return w, b


def _chain(k, x_ref, w_ref, gn_ref, eps):
    """Forward chain; returns per-stage saved values for the backward."""
    t = x_ref[:, :].astype(jnp.float32)
    stages = []
    for i in range(k):
        gw, gb = _affine(gn_ref, i)
        nrm, inv, h_pre = _gn_fwd(t, gw, gb, eps)
        h = jnp.maximum(h_pre, 0.0).astype(x_ref.dtype)
        t = jax.lax.dot_general(
            h, w_ref[i, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        stages.append((nrm, inv, h_pre, h))
    gw, gb = _affine(gn_ref, k)
    nrm, inv, y = _gn_fwd(t, gw, gb, eps)
    return stages, nrm, inv, y


def _fwd_kernel(k, eps, x_ref, res_ref, w_ref, gn_ref, o_ref):
    *_, y = _chain(k, x_ref, w_ref, gn_ref, eps)
    resf = res_ref[:, :].astype(jnp.float32)
    o_ref[:, :] = jnp.maximum(y + resf, 0.0).astype(o_ref.dtype)


def _bwd_kernel(k, eps, x_ref, res_ref, g_ref, w_ref, gn_ref,
                dx_ref, dy_ref, dw_ref, dgn_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)
        dgn_ref[:, :] = jnp.zeros_like(dgn_ref)

    stages, nrm_f, inv_f, y = _chain(k, x_ref, w_ref, gn_ref, eps)
    resf = res_ref[:, :].astype(jnp.float32)
    out_mask = ((y + resf) > 0.0).astype(jnp.float32)

    d_y = g_ref[:, :].astype(jnp.float32) * out_mask
    gw_f, _ = _affine(gn_ref, k)
    d_t = _gn_bwd(d_y, nrm_f, inv_f, gw_f)
    dgn_ref[4 * k : 4 * k + 1, :] += jnp.sum(d_y * nrm_f, axis=0, keepdims=True)
    dgn_ref[4 * k + 1 : 4 * k + 2, :] += jnp.sum(d_y, axis=0, keepdims=True)

    for i in reversed(range(k)):
        nrm, inv, h_pre, h = stages[i]
        # d_t is the cotangent of t_i = h_i @ W_i.
        dw_ref[i, :, :] += jax.lax.dot_general(
            h, d_t.astype(x_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_h = jax.lax.dot_general(
            d_t.astype(x_ref.dtype), w_ref[i, :, :],
            dimension_numbers=(((1,), (1,)), ((), ())),  # @ W_iᵀ
            preferred_element_type=jnp.float32,
        ) * (h_pre > 0.0).astype(jnp.float32)
        gw, _ = _affine(gn_ref, i)
        dgn_ref[4 * i : 4 * i + 1, :] += jnp.sum(d_h * nrm, axis=0, keepdims=True)
        dgn_ref[4 * i + 1 : 4 * i + 2, :] += jnp.sum(d_h, axis=0, keepdims=True)
        d_t = _gn_bwd(d_h, nrm, inv, gw)

    dx_ref[:, :] = d_t.astype(dx_ref.dtype)
    dy_ref[:, :] = d_y.astype(dy_ref.dtype)


def _tile(n: int) -> int:
    return 1024 if n >= 1024 else 256


def _pack_params(ws, gns, dtype):
    """ws: K [c,c] kernels → [K,c,c] in the activation dtype (Dense
    semantics: the matmul runs in self.dtype); gns: K+1 (w,b) affine
    pairs → [2(K+1),c] f32."""
    w = jnp.stack([wi.astype(dtype) for wi in ws])
    gn = jnp.stack([p for pair in gns for p in pair]).astype(jnp.float32)
    return w, gn


def _specs(k, c):
    return [
        pl.BlockSpec((k, c, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * (k + 1), c), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def _fwd_impl(x, res, w, gn, eps, interpret):
    n, c = x.shape
    k = w.shape[0]
    t = _tile(n)
    cost_model.record("row_tail", "fwd", n=n, t=t, c=c, k=k,
                      db=x.dtype.itemsize)
    row = pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k, eps),
        grid=(n // t,),
        in_specs=[row, row] + _specs(k, c),
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=interpret,
    )(x, res, w, gn)


def _bwd_impl(x, res, w, gn, g_out, eps, interpret):
    n, c = x.shape
    k = w.shape[0]
    t = _tile(n)
    cost_model.record("row_tail", "bwd", n=n, t=t, c=c, k=k,
                      db=x.dtype.itemsize)
    row = pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM)
    # dgn rows: 4 per stage (gw, gb, pad, pad) + 2 final + pad to sublanes.
    gn_rows = 4 * k + 8
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k, eps),
        grid=(n // t,),
        in_specs=[row, row, row] + _specs(k, c),
        out_specs=[
            row,
            row,
            pl.BlockSpec((k, c, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gn_rows, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((n, c), x.dtype),
            jax.ShapeDtypeStruct((k, c, c), jnp.float32),
            jax.ShapeDtypeStruct((gn_rows, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, res, g_out.astype(x.dtype), w, gn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _row_tail_p(x, res, w, gn, eps, interpret):
    return _fwd_impl(x, res, w, gn, eps, interpret)


def _vjp_fwd(x, res, w, gn, eps, interpret):
    out = _fwd_impl(x, res, w, gn, eps, interpret)
    return out, (x, res, w, gn)


def _vjp_bwd(eps, interpret, saved, g_out):
    x, res, w, gn = saved
    dx, d_y, dw, dgn = _bwd_impl(x, res, w, gn, g_out, eps, interpret)
    k = w.shape[0]
    # Re-pack the accumulated affine grads into the [2(K+1), c] layout.
    rows = [dgn[4 * i : 4 * i + 2] for i in range(k)] + [dgn[4 * k : 4 * k + 2]]
    # Cotangents must match the primal avals (w is packed in the activation
    # dtype under --bf16; stricter JAX versions reject f32 cotangents here).
    return (dx.astype(x.dtype), d_y.astype(res.dtype), dw.astype(w.dtype),
            jnp.concatenate(rows, axis=0).astype(gn.dtype))


_row_tail_p.defvjp(_vjp_fwd, _vjp_bwd)


def _run(x, res, ws, gns, eps, mode):
    n, c = x.shape
    t = _tile(n)
    pad = (-n) % t
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        res = jnp.pad(res, ((0, pad), (0, 0)))
    w, gn = _pack_params(ws, gns, x.dtype)
    out = _row_tail_p(x, res, w, gn, eps, mode == "interpret")
    return out[:n] if pad else out


def _resolve(mode):
    if mode == "auto":
        return "on" if jax.default_backend() in ("tpu", "axon") else "xla"
    return mode if mode in ("on", "interpret") else "xla"


def xla_reference(x, res, w, g1w, g1b, g2w, g2b, eps=1e-5):
    """Unfused K=1 formulation (matches models/fusion.py Att tail)."""
    from .norm import group_norm

    h = group_norm(x.astype(jnp.float32), g1w, g1b, 1, eps).astype(x.dtype)
    h = jnp.maximum(h, 0)
    z = jnp.dot(h, w.astype(x.dtype))
    y = group_norm(z.astype(jnp.float32), g2w, g2b, 1, eps).astype(x.dtype)
    return jnp.maximum(y + res, 0)


def xla_reference2(x, res, w1, w2, g1w, g1b, g2w, g2b, g3w, g3b, eps=1e-5):
    """Unfused K=2 formulation (matches models/lanercnn.py LanePooling tail)."""
    from .norm import group_norm

    h = group_norm(x.astype(jnp.float32), g1w, g1b, 1, eps).astype(x.dtype)
    h = jnp.maximum(h, 0)
    z = jnp.dot(h, w1.astype(x.dtype))
    h = group_norm(z.astype(jnp.float32), g2w, g2b, 1, eps).astype(x.dtype)
    h = jnp.maximum(h, 0)
    z = jnp.dot(h, w2.astype(x.dtype))
    y = group_norm(z.astype(jnp.float32), g3w, g3b, 1, eps).astype(x.dtype)
    return jnp.maximum(y + res, 0)


def fused_row_tail(x, res, w, g1w, g1b, g2w, g2b, eps=1e-5, mode="auto"):
    """relu(GN2(relu(GN1(x)) @ w) + res), single-group GroupNorms.

    x/res [N, C] (any N; rows are padded to the tile internally),
    w [C, C], affines [C].  mode: "auto" | "on" | "interpret" | "xla".
    """
    mode = _resolve(mode)
    if mode == "xla":
        return xla_reference(x, res, w, g1w, g1b, g2w, g2b, eps)
    return _run(x, res, [w], [(g1w, g1b), (g2w, g2b)], eps, mode)


def fused_row_tail2(x, res, w1, w2, g1w, g1b, g2w, g2b, g3w, g3b,
                    eps=1e-5, mode="auto"):
    """relu(GN3(relu(GN2(relu(GN1(x)) @ w1)) @ w2) + res) — the two-Linear
    LanePooling tail (models/lanercnn.py, reference lanercnn.py:497-505)."""
    mode = _resolve(mode)
    if mode == "xla":
        return xla_reference2(x, res, w1, w2, g1w, g1b, g2w, g2b, g3w, g3b, eps)
    return _run(x, res, [w1, w2],
                [(g1w, g1b), (g2w, g2b), (g3w, g3b)], eps, mode)
