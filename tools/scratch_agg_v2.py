"""Probe: fwd-kernel variants of the relation-pure window-agg to find the
101 ms pathology (timing only)."""

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
from lanegcn_tpu.ops.pallas_scenario_agg import (
    PLAN_CHUNK, _chunk_rel, _num_chunks, _onehot,
)

REPS = 5


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
    print(f"{label:36s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def make_fwd(variant, alias):
    CH = PLAN_CHUNK

    def kern(nch_ref, crel_ref, feat_ref, temp_ref, lu_ref, lv_ref, w_ref,
             out_ref, acc_ref):
        win = feat_ref[:]
        dt = win.dtype
        stride, c = win.shape
        ecap = lu_ref.shape[0]
        npc = ecap // CH
        s = pl.program_id(0)

        if variant == "direct":
            out_ref[:] = temp_ref[:]
        else:
            acc_ref[:] = temp_ref[:].astype(jnp.float32)

        def body(ck, _):
            c0 = pl.multiple_of(ck * CH, CH)
            rel_k = crel_ref[s * npc + ck]
            lv = lv_ref[pl.ds(c0, CH)]
            lu = lu_ref[pl.ds(c0, CH)]
            gath = jnp.dot(
                _onehot(lv, stride, dt), win, preferred_element_type=jnp.float32
            ).astype(dt)
            if variant == "staticw":
                msg = jnp.dot(gath, w_ref[0], preferred_element_type=jnp.float32)
            else:
                msg = jnp.dot(gath, w_ref[rel_k], preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(
                _onehot(lu, stride, dt), msg.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "direct":
                out_ref[:] = (out_ref[:].astype(jnp.float32) + contrib).astype(out_ref.dtype)
            else:
                acc_ref[:] += contrib
            return 0

        jax.lax.fori_loop(0, nch_ref[s], body, 0)
        if variant != "direct":
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    def call(feat, temp, w, lu, lv, rel, num_scen):
        n, c = feat.shape
        stride = n // num_scen
        ecap = lu.shape[0] // num_scen
        r = w.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_scen,),
            in_specs=[
                pl.BlockSpec((stride, c), lambda s, nch, cr: (s, 0)),
                pl.BlockSpec((stride, c), lambda s, nch, cr: (s, 0)),
                pl.BlockSpec((ecap, 1), lambda s, nch, cr: (s, 0)),
                pl.BlockSpec((ecap, 1), lambda s, nch, cr: (s, 0)),
                pl.BlockSpec((r, c, c), lambda s, nch, cr: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((stride, c), lambda s, nch, cr: (s, 0)),
            scratch_shapes=[pltpu.VMEM((stride, c), jnp.float32)],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, c), temp.dtype),
            grid_spec=grid_spec,
            input_output_aliases={3: 0} if alias else {},
        )(_num_chunks(lu, num_scen, ecap), _chunk_rel(rel, num_scen, ecap),
          feat, temp, lu, lv, w)

    return call


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
    w = jnp.asarray(rng.randn(14, c, c) * 0.05, dt)
    args = (feat, temp, w)

    for variant, alias, label in [
        ("scratch", True, "scratch acc + alias (shipped)"),
        ("scratch", False, "scratch acc, no alias"),
        ("direct", True, "direct out accumulate + alias"),
        ("staticw", True, "static weight w[0] + alias"),
    ]:
        fn = make_fwd(variant, alias)
        drained(
            lambda f, t, ww: fn(f, t, ww, g.plan_lu, g.plan_lv, g.plan_rel, num_scen),
            args, label=label,
        )


if __name__ == "__main__":
    main()
