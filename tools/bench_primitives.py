"""Honest single-op costs on the real chip at bench shapes (N=327680, C=128).

Informs the LaneConv aggregation design: how fast are XLA row-gathers vs
scatter-adds vs the stacked einsum on this TPU.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

N, C, R, E = 327680, 128, 14, 327680


def timed(name, fn, *args, iters=30):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(N, C) * 0.1, jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx)))
    msg = jnp.asarray(rng.randn(E, C) * 0.1, jnp.bfloat16)
    # ~half-valid table (like left/right coverage)
    tbl = np.full(N, N, np.int32)
    rows = rng.choice(N, N // 2, replace=False)
    tbl[rows] = rng.randint(0, N, N // 2)
    tbl = jnp.asarray(tbl)

    timed("row gather feat[idx]  (E=N rand)", lambda f: jnp.take(f, idx, axis=0, mode="clip"), feat)
    timed("row gather feat[idx]  (sorted)", lambda f: jnp.take(f, idx_sorted, axis=0, mode="clip"), feat)
    timed(
        "masked table gather (50% valid)",
        lambda f: jnp.where((tbl < N)[:, None], jnp.take(f, tbl, axis=0, mode="clip"), 0),
        feat,
    )
    timed(
        "scatter_add E=N rand",
        lambda m: jnp.zeros((N, C), jnp.bfloat16).at[idx].add(m, mode="drop"),
        msg,
    )
    timed(
        "scatter_add E=N sorted",
        lambda m: jnp.zeros((N, C), jnp.bfloat16)
        .at[idx_sorted]
        .add(m, mode="drop", indices_are_sorted=True),
        msg,
    )
    w = jnp.asarray(rng.randn(R, C, C) * 0.05, jnp.bfloat16)
    xs = jnp.asarray(rng.randn(R, N, C) * 0.1, jnp.bfloat16)
    timed(
        "einsum rnc,rcd->nd (R=14)",
        lambda x: jnp.einsum("rnc,rcd->nd", x, w, preferred_element_type=jnp.bfloat16),
        xs,
    )
    timed("elementwise x*1.0001 [N,C]", lambda f: f * 1.0001, feat)
    timed(
        "roll+mask+stack 12x + einsum",
        lambda f: jnp.einsum(
            "rnc,rcd->nd",
            jnp.stack([jnp.where((tbl < N)[:, None], jnp.roll(f, -s, 0), 0) for s in (1, 2, 4, 8, 16, 32, -1, -2, -4, -8, -16, -32)]),
            w[:12],
            preferred_element_type=jnp.bfloat16,
        ),
        feat,
    )
    # GroupNorm-ish: mean/var over channels + affine, fp32 stats
    def gn(x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    timed("groupnorm(ng=1) [N,C]", gn, feat)
    timed(
        "dense matmul [N,C]x[C,C]",
        lambda f: jnp.matmul(f, w[0], preferred_element_type=jnp.bfloat16),
        feat,
    )


if __name__ == "__main__":
    main()
