"""Pallas TPU kernel: fused banded LaneConv aggregation.

Computes, for the J=12 intra-lane band relations of a LaneConv layer,

    out[u] = Σ_j band_j[u] · ( feat[u + s_j] @ W_j ),   s_j ∈ ±{1,2,4,8,16,32}

in one pass: each grid step DMAs a node tile plus a ±32-row halo from HBM
into VMEM (overlapping windows — BlockSpec can't express halos) and
accumulates all 12 shifted masked matmuls on the MXU without materializing
the [J, N, C] relation stack the XLA einsum formulation needs (measured:
stack construction + einsum ≈ 3 HBM passes over J·N·C per layer; this
kernel streams feat + a same-sized mask plane once).

Masks ride as a [N, 128] plane (one lane per relation, node-major) so every
in-kernel slice has a static in-window offset; the halo'd windows make the
mask reads for the transpose convolution static too.

The backward is a second kernel of the same shape: the transpose
convolution dfeat[p] = Σ_j band_j[p − s_j] · (g[p − s_j] @ W_jᵀ) reads a
cotangent halo instead of writing halos (no overlapping writes), and
dW_j = Σ_u band_j[u] · feat[u + s_j]ᵀ g[u] accumulates across grid steps
into a revisited [J, C, C] f32 output (TPU grids run sequentially).

Wrapped in jax.custom_vjp as `band_conv(feat, masks, w, shifts)`; masks are
0/1 multipliers [J, N] in feat's dtype (relation order fixed by the
caller), w is [J, C, C]. Parity with the einsum path is pinned by
tests/test_pallas_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 32  # max |band shift|
_MLANES = 128  # mask plane lane count (J ≤ 128)


def _fwd_kernel(shifts, tile, x_hbm, m_hbm, w_ref, o_ref, xw, mw, sems):
    b = pl.program_id(0)
    t = tile
    win = pl.ds(b * t, t + 2 * HALO)
    cp_x = pltpu.make_async_copy(x_hbm.at[win], xw, sems.at[0])
    cp_m = pltpu.make_async_copy(m_hbm.at[win], mw, sems.at[1])
    cp_x.start()
    cp_m.start()
    cp_x.wait()
    cp_m.wait()
    x = xw[:, :]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j, s in enumerate(shifts):
        rows = x[HALO + s : HALO + s + t, :]
        m = mw[HALO : HALO + t, j : j + 1]
        acc += jax.lax.dot_general(
            rows * m,
            w_ref[j, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:, :] = acc.astype(o_ref.dtype)


def _bwd_kernel(
    shifts, tile, x_hbm, g_hbm, m_hbm, w_ref, dx_ref, dw_ref, xw, gw, mw, sems
):
    b = pl.program_id(0)
    t = tile
    win = pl.ds(b * t, t + 2 * HALO)
    cp_x = pltpu.make_async_copy(x_hbm.at[win], xw, sems.at[0])
    cp_g = pltpu.make_async_copy(g_hbm.at[win], gw, sems.at[1])
    cp_m = pltpu.make_async_copy(m_hbm.at[win], mw, sems.at[2])
    cp_x.start()
    cp_g.start()
    cp_m.start()
    cp_x.wait()
    cp_g.wait()
    cp_m.wait()
    x = xw[:, :]
    g = gw[:, :]

    @pl.when(b == 0)
    def _():
        dw_ref[:, :, :] = jnp.zeros_like(dw_ref)

    dx = jnp.zeros(dx_ref.shape, jnp.float32)
    g_mid = g[HALO : HALO + t, :]
    for j, s in enumerate(shifts):
        # dfeat[p] += band_j[p − s] · g[p − s] @ W_jᵀ
        g_shift = g[HALO - s : HALO - s + t, :]
        m_shift = mw[HALO - s : HALO - s + t, j : j + 1]
        dx += jax.lax.dot_general(
            g_shift * m_shift,
            w_ref[j, :, :],
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract with Wᵀ
            preferred_element_type=jnp.float32,
        )
        # dW_j += (band_j[u] · feat[u + s])ᵀ g[u], u in this tile
        rows = x[HALO + s : HALO + s + t, :]
        m_mid = mw[HALO : HALO + t, j : j + 1]
        dw_ref[j, :, :] += jax.lax.dot_general(
            rows * m_mid,
            g_mid,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[:, :] = dx.astype(dx_ref.dtype)


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128):
        if n % t == 0:
            return t
    return 0


def _prep(feat, masks):
    n, c = feat.shape
    t = _pick_tile(n)
    assert t, f"num nodes {n} must be a multiple of 128"
    xp = jnp.pad(feat, ((HALO, HALO), (0, 0)))
    # [J, N] → node-major [N + 2H, 128] plane, one lane per relation.
    j = masks.shape[0]
    mp = jnp.pad(masks.T, ((HALO, HALO), (0, _MLANES - j)))
    return n, c, t, xp, mp


def _fwd_impl(feat, masks, w, shifts, interpret):
    n, c, t, xp, mp = _prep(feat, masks)
    j = len(shifts)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, shifts, t),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp, windowed DMA
            pl.BlockSpec(memory_space=pl.ANY),  # mask plane, windowed DMA
            pl.BlockSpec((j, c, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), feat.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * HALO, c), feat.dtype),
            pltpu.VMEM((t + 2 * HALO, _MLANES), feat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, mp, w)


def _bwd_impl(feat, masks, w, g_out, shifts, interpret):
    n, c, t, xp, mp = _prep(feat, masks)
    j = len(shifts)
    gp = jnp.pad(g_out.astype(feat.dtype), ((HALO, HALO), (0, 0)))
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, shifts, t),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp
            pl.BlockSpec(memory_space=pl.ANY),  # gp
            pl.BlockSpec(memory_space=pl.ANY),  # mask plane
            pl.BlockSpec((j, c, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((j, c, c), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), feat.dtype),
            jax.ShapeDtypeStruct((j, c, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t + 2 * HALO, c), feat.dtype),
            pltpu.VMEM((t + 2 * HALO, c), feat.dtype),
            pltpu.VMEM((t + 2 * HALO, _MLANES), feat.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xp, gp, mp, w)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def band_conv(feat, masks, w, shifts, interpret=False):
    """Σ_j masks[j] · (feat shifted by s_j) @ w[j] → [N, C].

    feat [N, C]; masks [J, N] 0/1 in feat's dtype; w [J, C, C];
    shifts: static tuple of J ints, |s| ≤ HALO.
    """
    return _fwd_impl(feat, masks, w, shifts, interpret)


def _vjp_fwd(feat, masks, w, shifts, interpret):
    return _fwd_impl(feat, masks, w, shifts, interpret), (feat, masks, w)


def _vjp_bwd(shifts, interpret, res, g_out):
    feat, masks, w = res
    dx, dw = _bwd_impl(feat, masks, w, g_out, shifts, interpret)
    return dx, jnp.zeros_like(masks), dw.astype(w.dtype)


band_conv.defvjp(_vjp_fwd, _vjp_bwd)
