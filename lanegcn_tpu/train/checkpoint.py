"""Checkpoint save/restore (reference save_ckpt train.py:230-242,
load_pretrain utils.py:51-59).

Stores params + optimizer state + fractional epoch/step using Orbax when
available, falling back to a plain .npz of flattened pytree leaves. Loads are
shape-checked partial restores like the reference's load_pretrain: mismatched
entries are skipped, not fatal.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, params, opt_state, step: int, epoch: float) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "step": int(step),
        "epoch": float(epoch),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic → preemption-safe


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(path: str, params, opt_state, step: int, epoch: float) -> None:
    """Orbax-backed checkpoint: handles sharded (multi-host) arrays natively —
    each host writes its shards; restore re-shards to the current mesh."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": params,
        "opt_state": opt_state,
        "meta": {"step": int(step), "epoch": float(epoch)},
    }
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, template) -> Dict[str, Any]:
    """Restore an orbax checkpoint; template = matching pytree of arrays (or
    ShapeDtypeStructs with shardings) to restore onto."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def load_pretrain(params, pretrain_params):
    """Shape-checked partial restore (reference utils.py:51-59): copy every
    leaf whose path exists in both trees with matching shape."""
    flat_new = _flatten(pretrain_params)

    def merge(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        cand = flat_new.get(key)
        if cand is not None and cand.shape == leaf.shape:
            return jax.numpy.asarray(cand, leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(merge, params)
