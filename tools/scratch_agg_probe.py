"""Probe: decompose the scenario-window aggregation kernel's cost on the
real chip by timing ablated variants (NOT numerically meaningful — timing
only). Decides the round-4 redesign of ops/pallas_scenario_agg.

Variants (fwd):
  full       — shipped kernel shape: onehot gather + 14 masked matmuls + onehot scatter
  nogather   — replace the gather one-hot matmul with win[:chunk] (timing floor without G_v)
  noscatter  — skip the scatter one-hot matmul (accumulate sum into out row 0)
  norel      — single matmul instead of 14 masked ones
  onlyhots   — just build both one-hots and do the two one-hot matmuls (no relation work)
  chunk1024 / chunk256 — full kernel at other chunk sizes
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config

REPS = int(os.environ.get("PROBE_REPS", "5"))


def drained(fn, args, iters=20, label=""):
    def chain(*a):
        x = a[0]
        for _ in range(REPS):
            out = fn(x, *a[1:])
            x = (x * 0.999 + jnp.sum(out).astype(x.dtype) * 1e-30).astype(a[0].dtype)
        return x

    cfn = jax.jit(chain)
    out = cfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = cfn(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / (iters * REPS)
    print(f"{label:28s} {dt*1e3:8.3f} ms")
    return dt


def _onehot(idx_col, width, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx_col.shape[0], width), 1)
    return (idx_col == iota).astype(dtype)


def make_kernel(num_rel, chunk, variant):
    def kern(nch_ref, feat_ref, temp_ref, lu_ref, lv_ref, rel_ref, w_ref, out_ref):
        win = feat_ref[:]
        dt = win.dtype
        stride, c = win.shape
        ecap = lu_ref.shape[0]
        s = pl.program_id(0)
        out_ref[:] = temp_ref[:]
        for ck, c0 in enumerate(range(0, ecap, chunk)):
            c1 = min(c0 + chunk, ecap)

            @pl.when(ck < nch_ref[s])
            def _(c0=c0, c1=c1):
                lv = lv_ref[c0:c1]
                lu = lu_ref[c0:c1]
                rel = rel_ref[c0:c1]
                nch_e = c1 - c0
                if variant == "nogather":
                    gath = win[0:nch_e, :]
                else:
                    gath = jnp.dot(
                        _onehot(lv, stride, dt), win,
                        preferred_element_type=jnp.float32,
                    ).astype(dt)
                if variant in ("norel", "onlyhots"):
                    msg = jnp.dot(gath, w_ref[0], preferred_element_type=jnp.float32)
                else:
                    msg = jnp.zeros((gath.shape[0], c), jnp.float32)
                    for r in range(num_rel):
                        m = (rel == r).astype(dt)
                        msg += jnp.dot(
                            gath * m, w_ref[r], preferred_element_type=jnp.float32
                        )
                if variant == "noscatter":
                    out_ref[0:nch_e, :] = (
                        out_ref[0:nch_e, :].astype(jnp.float32) + msg
                    ).astype(out_ref.dtype)
                else:
                    s_u = (
                        jnp.transpose(lu)
                        == jax.lax.broadcasted_iota(jnp.int32, (stride, lu.shape[0]), 0)
                    ).astype(dt)
                    out_ref[:] = (
                        out_ref[:].astype(jnp.float32)
                        + jnp.dot(s_u, msg.astype(dt), preferred_element_type=jnp.float32)
                    ).astype(out_ref.dtype)

    return kern


def make_kernel_dg(num_rel, chunk):
    """dot_general variant: scatter via edge-dim contraction on onehot(lu)
    (no transposed s_u build)."""

    def kern(nch_ref, feat_ref, temp_ref, lu_ref, lv_ref, rel_ref, w_ref, out_ref):
        win = feat_ref[:]
        dt = win.dtype
        stride, c = win.shape
        ecap = lu_ref.shape[0]
        s = pl.program_id(0)
        out_ref[:] = temp_ref[:]
        for ck, c0 in enumerate(range(0, ecap, chunk)):
            c1 = min(c0 + chunk, ecap)

            @pl.when(ck < nch_ref[s])
            def _(c0=c0, c1=c1):
                lv = lv_ref[c0:c1]
                lu = lu_ref[c0:c1]
                rel = rel_ref[c0:c1]
                gath = jnp.dot(
                    _onehot(lv, stride, dt), win, preferred_element_type=jnp.float32
                ).astype(dt)
                msg = jnp.zeros((gath.shape[0], c), jnp.float32)
                for r in range(num_rel):
                    m = (rel == r).astype(dt)
                    msg += jnp.dot(
                        gath * m, w_ref[r], preferred_element_type=jnp.float32
                    )
                oh_u = _onehot(lu, stride, dt)
                out_ref[:] = (
                    out_ref[:].astype(jnp.float32)
                    + jax.lax.dot_general(
                        oh_u, msg.astype(dt),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                ).astype(out_ref.dtype)

    return kern


def run_variant(g, feat, temp, w_rel, num_scen, chunk, variant, label):
    n, c = feat.shape
    lu, lv, rel = g.plan_lu, g.plan_lv, g.plan_rel
    stride = n // num_scen
    ecap = lu.shape[0] // num_scen
    r = w_rel.shape[0]
    valid = jnp.sum((lu >= 0).reshape(num_scen, ecap), axis=1)
    nch = ((valid + chunk - 1) // chunk).astype(jnp.int32)
    kern = make_kernel_dg(r, chunk) if variant == "dgscatter" else make_kernel(r, chunk, variant)
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

    def call(f, t, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, c), t.dtype),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
        )(nch, f, t, lu, lv, rel, w)

    drained(jax.jit(call), (feat, temp, w_rel), label=label)


def main():
    config = Config(pack=bench_pack_config())
    batches, stats, _ = make_batches(config, 1, config.pack.max_scenarios)
    g = batches[0].graph
    n, c = g.ctrs.shape[0], config.model.n_map
    num_scen = g.plan_scen
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    feat = jnp.asarray(rng.randn(n, c) * 0.1, dt)
    temp = jnp.asarray(rng.randn(n, c) * 0.1, dt)
    w_rel = jnp.asarray(rng.randn(14, c, c) * 0.05, dt)
    print(f"# N={n} windows={num_scen} ecap={g.plan_lu.shape[0]//num_scen}")
    for chunk, variant, label in [
        (512, "full", "full c512 (shipped)"),
        (512, "dgscatter", "dot_general scatter c512"),
        (512, "nogather", "no gather one-hot"),
        (512, "noscatter", "no scatter one-hot"),
        (512, "norel", "single-relation matmul"),
        (512, "onlyhots", "one-hots only (no rel work)"),
        (1024, "full", "full c1024"),
        (256, "full", "full c256"),
    ]:
        run_variant(g, feat, temp, w_rel, num_scen, chunk, variant, label)


if __name__ == "__main__":
    main()
