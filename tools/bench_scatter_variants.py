"""Honest (drained) comparison of LaneConv irregular-edge aggregation
strategies at bench shapes on the real chip.

Variants, per layer (14 relations, bench capacities):
  A. current: per-relation gather → matmul → scatter_add (14 scatters)
  B. combined: per-relation gather+matmul (contiguous static slices of one
     [E_tot] buffer), ONE scatter_add of the concatenated messages
  C. combined + destination-sorted segment ids (indices_are_sorted path)
  D. combined + Pallas sorted_segment_sum (block one-hot MXU reduction)

Run: python tools/bench_scatter_variants.py
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

from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config, relation_names
from lanegcn_tpu.ops import masked_gather, scatter_add
from lanegcn_tpu.ops.pallas_scatter import sorted_segment_sum

C = 128
DTYPE = jnp.bfloat16


def timed(name, fn, *args, iters=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    config = Config(pack=bench_pack_config())
    batches, _, _ = make_batches(config, 1, config.pack.max_scenarios)
    g = batches[0].graph
    names = relation_names(config.model.num_scales)
    n = g.ctrs.shape[0]
    feat = jnp.asarray(
        np.random.RandomState(0).randn(n, C) * 0.1, DTYPE
    )
    w = jnp.asarray(np.random.RandomState(1).randn(len(names), C, C) * 0.05, DTYPE)

    valid = {nm: int(jnp.sum(g.edges[nm].mask)) for nm in names}
    caps = {nm: int(g.edges[nm].u.shape[0]) for nm in names}
    print(f"# n={n}; per-relation valid/capacity: "
          + ", ".join(f"{nm}={valid[nm]}/{caps[nm]}" for nm in names), flush=True)

    # ---- A: current per-relation scatters
    def variant_a(feat):
        temp = jnp.zeros_like(feat)
        for r, nm in enumerate(names):
            e = g.edges[nm]
            src = masked_gather(feat, e.v, e.mask)
            msg = jnp.matmul(src, w[r], preferred_element_type=DTYPE)
            temp = scatter_add(msg, e.u, n, mask=e.mask, out=temp)
        return temp

    # ---- B: one combined scatter (host-side concat of edge lists)
    u_cat = jnp.concatenate([g.edges[nm].u for nm in names])
    v_cat = jnp.concatenate([g.edges[nm].v for nm in names])
    m_cat = jnp.concatenate([g.edges[nm].mask for nm in names])
    bounds = np.cumsum([0] + [caps[nm] for nm in names])

    def variant_b(feat):
        src = masked_gather(feat, v_cat, m_cat)
        msgs = []
        for r, nm in enumerate(names):
            s = src[bounds[r] : bounds[r + 1]]
            msgs.append(jnp.matmul(s, w[r], preferred_element_type=DTYPE))
        msg = jnp.concatenate(msgs)
        return scatter_add(msg, u_cat, n, mask=m_cat, out=jnp.zeros_like(feat))

    # ---- C/D: destination-sorted (host-side sort; on real packs the packer
    # emits this order + the inverse perm for the relation-major matmuls)
    key = np.where(np.asarray(m_cat), np.asarray(u_cat), n)
    order = np.argsort(key, kind="stable")
    seg_sorted = jnp.asarray(key[order].astype(np.int32))
    perm = jnp.asarray(order.astype(np.int32))

    def variant_c(feat):
        src = masked_gather(feat, v_cat, m_cat)
        msgs = []
        for r, nm in enumerate(names):
            s = src[bounds[r] : bounds[r + 1]]
            msgs.append(jnp.matmul(s, w[r], preferred_element_type=DTYPE))
        msg = jnp.concatenate(msgs)[perm]
        out = jnp.zeros_like(feat)
        return out.at[seg_sorted].add(
            msg, mode="drop", indices_are_sorted=True, unique_indices=False
        )

    # max edges landing in one 128-row destination block (host-computed)
    blk = np.asarray(seg_sorted) // 128
    mepb = int(np.max(np.bincount(blk[np.asarray(key[order]) < n], minlength=1)))
    print(f"# combined edges={int(np.sum(key < n))}, max-edges-per-128-block={mepb}",
          flush=True)

    def variant_d(feat):
        src = masked_gather(feat, v_cat, m_cat)
        msgs = []
        for r, nm in enumerate(names):
            s = src[bounds[r] : bounds[r + 1]]
            msgs.append(jnp.matmul(s, w[r], preferred_element_type=DTYPE))
        msg = jnp.concatenate(msgs)[perm]
        return sorted_segment_sum(msg, seg_sorted, n, max_edges_per_block=mepb)

    ta = timed("A per-relation scatters (current)", variant_a, feat)
    tb = timed("B one combined scatter", variant_b, feat)
    tc = timed("C combined + sorted indices", variant_c, feat)
    try:
        td = timed("D combined + Pallas sorted_segment_sum", variant_d, feat)
    except Exception as ex:
        print("D failed:", ex, flush=True)
        td = float("inf")

    # numerics cross-check (bf16 tolerance; order differs → small diffs)
    a = np.asarray(variant_a(feat), np.float32)
    for nm, f in (("B", variant_b), ("C", variant_c)):
        b = np.asarray(f(feat), np.float32)
        print(f"# max|A-{nm}| = {np.max(np.abs(a - b)):.4f}", flush=True)
    if np.isfinite(td):
        d = np.asarray(variant_d(feat), np.float32)
        print(f"# max|A-D| = {np.max(np.abs(a - d)):.4f}", flush=True)

    # grads (the backward matters as much)
    def loss_of(fn):
        return lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)

    timed("A grad", jax.grad(loss_of(variant_a)), feat)
    timed("B grad", jax.grad(loss_of(variant_b)), feat)
    timed("C grad", jax.grad(loss_of(variant_c)), feat)
    if np.isfinite(td):
        timed("D grad", jax.grad(loss_of(variant_d)), feat)


if __name__ == "__main__":
    main()
