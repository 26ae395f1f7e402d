"""Single-blob host→device transfer for packed batches.

The axon relay (and any RPC-attached accelerator) pays a ~50 ms round trip
PER ARRAY transferred, independent of size — a PackedBatch has ~90 leaves,
so leaf-wise `jax.tree.map(jnp.asarray, batch)` costs ~1.5 s/pack while the
actual bytes (~25 MB) need ~50 ms. This module ships the whole pytree as
ONE uint8 buffer and splits it back into leaves INSIDE one jitted device
program (static slices + bitcasts — XLA fuses the unpack into pure device
copies).

Usage:
    batch_dev = device_put_blob(batch_host)   # one transfer, same pytree

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
# dtypes narrow exactly like jnp.asarray would.
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
def _make_unpacker(treedef, spec: Tuple[Tuple[tuple, str], ...]):
    """Jitted blob → pytree splitter. spec = ((shape, dtype-str), ...)."""
    offs = []
    off = 0
    for shape, dstr in spec:
        dt = np.dtype(dstr)
        nb = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        offs.append((off, nb, shape, dt))
        off += nb

    def unpack(blob):
        leaves = []
        for off, nb, shape, dt in offs:
            raw = jax.lax.slice(blob, (off,), (off + nb,))
            if dt == np.bool_:
                leaf = raw.astype(jnp.bool_)
            elif dt.itemsize == 1:
                leaf = jax.lax.bitcast_convert_type(raw, dt)
            else:
                leaf = jax.lax.bitcast_convert_type(
                    raw.reshape(-1, dt.itemsize), dt
                )
            leaves.append(leaf.reshape(shape))
        return jax.tree.unflatten(treedef, leaves)

    return jax.jit(unpack)


def device_put_blob(tree: Any):
    """Transfer a pytree of host numpy arrays as one uint8 blob and split it
    on device. Returns the same pytree with device-array leaves (dtypes
    canonicalized exactly like jnp.asarray: int64→int32, float64→float32)."""
    leaves, treedef = jax.tree.flatten(tree)
    leaves = [_canon(l) for l in leaves]
    spec = tuple((l.shape, l.dtype.str) for l in leaves)
    total = sum(l.nbytes for l in leaves)
    blob = np.empty(total, np.uint8)
    off = 0
    for l in leaves:
        blob[off : off + l.nbytes] = l.view(np.uint8).ravel()
        off += l.nbytes
    return _make_unpacker(treedef, spec)(blob)
