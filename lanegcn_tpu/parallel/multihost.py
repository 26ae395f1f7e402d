"""Multi-host coordination: process init + cross-host metric reduction.

Replaces the reference's mpi4py COMM_WORLD.allgather metric sync
(reference train.py:30-33,245-255) and horovod init/broadcast
(train.py:34-35,145-146): `jax.distributed.initialize()` discovers the pod,
params replicate via shardings (no explicit broadcast), and metric sums
reduce with process_allgather.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX. Pass coordinator_address/num_processes/
    process_id for manual setups; TPU pods auto-discover with no kwargs.

    Idempotent: returns silently if the distributed runtime is already up.
    An explicit manual setup (kwargs given) that fails raises — a silent
    no-op there would train single-host with per-host data and wrong
    gradients. Auto-discovery failure (no cluster env) is the normal
    single-process case and is swallowed."""
    if jax.distributed.is_initialized():
        return
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if kwargs:
            raise
        # no kwargs + no detectable cluster: single-process run


def process_seed(base_seed: int) -> int:
    """Per-process data seed (reference seeds per hvd rank, train.py:55-59)."""
    return base_seed + jax.process_index()


def sync_metric_sums(metrics: Dict[str, float]) -> Dict[str, float]:
    """Sum scalar metric accumulators across hosts (reference MPI allgather +
    host-side merge, train.py:245-255). Works on one host too."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    local = np.asarray([float(metrics[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)  # [P, len(keys)]
    summed = np.sum(gathered, axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}
