"""Few-blob host→device transfer for packed batches.

The axon relay (and any RPC-attached accelerator) pays a ~50 ms round trip
PER ARRAY transferred, independent of size — a PackedBatch has ~90 leaves,
so leaf-wise `jax.tree.map(jnp.asarray, batch)` costs ~1.5 s/pack while the
actual bytes (~25 MB) need ~50 ms. This module ships the whole pytree as
ONE buffer PER DTYPE (float32 / int32 / uint8-bool / ...) and splits them
back into leaves INSIDE one jitted device program. Same-dtype packing keeps
the unpack program to static 1-D slices + reshapes — no bitcasts, which
the remote-compile backend lowers pathologically (measured: a uint8+bitcast
formulation hung XLA compilation for minutes).

Usage:
    batch_dev = device_put_blob(batch_host)   # few transfers, same pytree

The unpack program is compiled once per (treedef, shapes/dtypes) — static
per PackConfig, so training reuses a single compilation.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# jnp-canonical dtypes under the default x64-disabled config: wider host
# dtypes narrow exactly like jnp.asarray would. bool ships as uint8.
_CANON = {
    np.dtype(np.int64): np.dtype(np.int32),
    np.dtype(np.uint64): np.dtype(np.uint32),
    np.dtype(np.float64): np.dtype(np.float32),
}


def _canon(leaf: np.ndarray) -> np.ndarray:
    arr = np.asarray(leaf)
    tgt = _CANON.get(arr.dtype)
    if tgt is not None:
        arr = arr.astype(tgt)
    return np.ascontiguousarray(arr)


@functools.lru_cache(maxsize=32)
def _make_unpacker(treedef, spec: Tuple[Tuple[tuple, str], ...],
                   blob_dtypes: Tuple[str, ...], sharding=None):
    """Jitted (blob_0, ..., blob_k) → pytree splitter.

    spec = ((shape, dtype-str), ...) per leaf; each leaf reads a static
    1-D slice of its dtype's blob. bool leaves ride the uint8 blob.
    sharding: optional NamedSharding applied to every output leaf (the
    mesh path: e.g. P('data', 'graph') over a stacked windowed batch) —
    XLA lays the unpacked leaves out across the mesh directly."""
    offs = {d: 0 for d in blob_dtypes}
    plan = []
    for shape, dstr in spec:
        dt = np.dtype(dstr)
        key = "|u1" if dt == np.bool_ else dt.str
        n = int(np.prod(shape, dtype=np.int64))
        plan.append((key, offs[key], n, shape, dt == np.bool_))
        offs[key] += n

    def unpack(*blobs):
        by_dtype = dict(zip(blob_dtypes, blobs))
        leaves = []
        for key, off, n, shape, is_bool in plan:
            raw = jax.lax.slice(by_dtype[key], (off,), (off + n,))
            if is_bool:
                raw = raw.astype(jnp.bool_)
            leaves.append(raw.reshape(shape))
        return jax.tree.unflatten(treedef, leaves)

    if sharding is not None:
        out_sh = jax.tree.unflatten(treedef, [sharding] * len(spec))
        return jax.jit(unpack, out_shardings=out_sh)
    return jax.jit(unpack)


def pack_blobs(tree: Any):
    """Host tree → (tuple of host blob arrays — one per dtype — and a
    static meta tuple (treedef, spec, blob_dtypes) for unpack_blobs)."""
    leaves, treedef = jax.tree.flatten(tree)
    leaves = [_canon(l) for l in leaves]
    spec = tuple((l.shape, l.dtype.str) for l in leaves)
    groups = {}
    for l in leaves:
        key = "|u1" if l.dtype == np.bool_ else l.dtype.str
        groups.setdefault(key, []).append(
            l.view(np.uint8).view(np.dtype(key)) if l.dtype == np.bool_ else l
        )
    blob_dtypes = tuple(sorted(groups))
    blobs = tuple(
        np.concatenate([g.ravel() for g in groups[d]])
        if groups[d] else np.zeros(0, np.dtype(d))
        for d in blob_dtypes
    )
    return blobs, (treedef, spec, blob_dtypes)


def unpack_blobs(meta, *blobs):
    """Pure, jit-traceable splitter: blob arrays → the original pytree.
    meta from pack_blobs. Used INSIDE jitted steps so a freshly
    transferred batch crosses the dispatch boundary as ~3 arrays instead
    of ~90 (the axon relay charges per argument handle per execute call —
    measured +436 ms/step for a ~90-leaf fresh batch,
    tools/bench_e2e_interleave.py)."""
    treedef, spec, blob_dtypes = meta
    offs = {d: 0 for d in blob_dtypes}
    by_dtype = dict(zip(blob_dtypes, blobs))
    leaves = []
    for shape, dstr in spec:
        dt = np.dtype(dstr)
        key = "|u1" if dt == np.bool_ else dt.str
        n = int(np.prod(shape, dtype=np.int64))
        raw = jax.lax.slice(by_dtype[key], (offs[key],), (offs[key] + n,))
        if dt == np.bool_:
            raw = raw.astype(jnp.bool_)
        leaves.append(raw.reshape(shape))
        offs[key] += n
    return jax.tree.unflatten(treedef, leaves)


def blob_step(step, meta):
    """Wrap a jitted step fn(params, opt_state, batch, epoch) into
    fn(params, opt_state, blobs_tuple, epoch): the batch is rebuilt from
    the dtype blobs inside the jit, so each step call passes only the
    blob handles to the runtime."""
    @functools.partial(jax.jit, donate_argnums=(2,))
    def wrapped(params, opt_state, blobs, epoch):
        batch = unpack_blobs(meta, *blobs)
        return step(params, opt_state, batch, epoch)

    return wrapped


def blob_multi_step(step, meta):
    """K steps per dispatch over [K]-stacked blobs: lax.scan unpacks each
    step's batch from its blob slices inside the jit. ONE fresh-buffer
    set crosses the dispatch boundary per K steps — on relay-attached
    devices the per-interleaved-transfer penalty (measured ~200-400 ms,
    tools/bench_e2e_interleave.py) amortizes by K. Metric semantics match
    train.loop.make_multi_train_step (sums; loss = mean, lr = last)."""
    @functools.partial(jax.jit, donate_argnums=(2,))
    def wrapped(params, opt_state, blobs, epoch0, d_epoch):
        def body(carry, xs):
            p, o, i = carry
            batch = unpack_blobs(meta, *xs)
            p, o, m = step(p, o, batch, epoch0 + i * d_epoch)
            return (p, o, i + 1.0), m

        (p, o, _), ms = jax.lax.scan(body, (params, opt_state, 0.0), blobs)
        out = jax.tree.map(lambda x: jnp.sum(x, axis=0), ms)
        out["loss"] = jnp.mean(ms["loss"])
        if "lr" in ms:
            out["lr"] = ms["lr"][-1]
        return p, o, out

    return wrapped


def device_put_blobs(tree: Any):
    """Host tree → (tuple of DEVICE blob arrays (async put), meta)."""
    blobs, meta = pack_blobs(tree)
    return tuple(jnp.asarray(b) for b in blobs), meta


def device_put_blob(tree: Any, sharding=None):
    """Transfer a pytree of host numpy arrays as one buffer per dtype and
    split on device. Returns the same pytree with device-array leaves
    (dtypes canonicalized exactly like jnp.asarray: int64→int32,
    float64→float32). sharding: optional NamedSharding for every leaf
    (single-process mesh runs — the worker-thread transfer then lands
    mesh-sharded, keeping the overlap the single-device path has)."""
    leaves, treedef = jax.tree.flatten(tree)
    leaves = [_canon(l) for l in leaves]
    spec = tuple((l.shape, l.dtype.str) for l in leaves)
    groups = {}
    for l in leaves:
        key = "|u1" if l.dtype == np.bool_ else l.dtype.str
        groups.setdefault(key, []).append(
            l.view(np.uint8).view(np.dtype(key)) if l.dtype == np.bool_ else l
        )
    blob_dtypes = tuple(sorted(groups))
    blobs = [
        np.concatenate([g.ravel() for g in groups[d]])
        if groups[d] else np.zeros(0, np.dtype(d))
        for d in blob_dtypes
    ]
    return _make_unpacker(treedef, spec, blob_dtypes, sharding)(*blobs)
