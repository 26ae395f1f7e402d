"""Data-parallel sharding of packed batches over a device mesh.

Layout: a *global* batch is a stack of per-device packs — every PackedBatch
leaf gains a leading axis of size G (G a multiple of the mesh `data` axis).
The model is vmapped over that axis; jit + NamedSharding partitions it across
devices, so per-pack forward/backward is local and the gradient reduction is
an XLA-inserted psum riding ICI (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lanegcn_tpu.config import Config
from lanegcn_tpu.graph import PackedBatch
from lanegcn_tpu.models.lanegcn import agent_metrics, pred_loss
from lanegcn_tpu.train.optimizer import apply_lr, guarded_optimizer_step, optimizer_step


def make_mesh(devices: Sequence[jax.Device] | None = None, data: int | None = None) -> Mesh:
    """1-D `data` mesh."""
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices)
    return Mesh(np.asarray(devices[:data]).reshape(data), ("data",))


def make_mesh_2d(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    graph: int = 1,
) -> Mesh:
    """2-D (data × graph) mesh: packs shard over `data`, the node/edge axes
    of each pack shard over `graph` (edge-partitioned lane graph — GSPMD
    inserts the boundary gathers/reductions over ICI)."""
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices) // graph
    need = data * graph
    assert len(devices) >= need, (len(devices), data, graph)
    return Mesh(np.asarray(devices[:need]).reshape(data, graph), ("data", "graph"))


def graph_batch_shardings(mesh: Mesh, batch) -> object:
    """Per-leaf shardings for a stacked batch on a (data, graph) mesh: the
    leading pack axis shards over `data`; the per-pack node/edge/actor axis
    (dim 1) shards over `graph` when divisible. Scalars-per-pack stay
    data-sharded only."""
    graph_size = mesh.shape.get("graph", 1)

    def spec(leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "ndim") else leaf
        if (
            graph_size > 1
            and arr.ndim >= 2
            and arr.shape[1] >= 2 * graph_size
            and arr.shape[1] % graph_size == 0
        ):
            return NamedSharding(mesh, P("data", "graph"))
        return NamedSharding(mesh, P("data"))

    return jax.tree.map(spec, batch)


def stack_packs(packs: Sequence[PackedBatch]) -> PackedBatch:
    """Stack per-device packs into a global batch with leading axis G."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *packs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_parallel_train_step(
    config: Config,
    net,
    tx,
    lr_fn,
    mesh: Mesh,
    loss_fn=None,
    metrics_fn=None,
    batch_shardings=None,
) -> Callable:
    """jit-compiled SPMD train step over stacked packs.

    fn(params, opt_state, batch[G, ...], epoch) → (params, opt_state, metrics)
    Loss = mean of per-pack losses (each normalized by its own support,
    matching horovod's average-of-local-losses gradient semantics,
    reference train.py:66-69); metric sums are summed across packs.

    batch_shardings: optional per-leaf shardings (e.g. graph_batch_shardings
    for a 2-D data×graph mesh); defaults to leading-axis data sharding.
    """
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics

    def mean_loss(params, batch):
        def per_pack(b):
            out = net.apply({"params": params}, b)
            losses = loss_fn(out, b, config.loss)
            m = dict(losses)
            m.update(metrics_fn(out, b))
            return losses["loss"], m

        loss, metrics = jax.vmap(per_pack)(batch)
        metrics = jax.tree.map(lambda x: jnp.sum(x, axis=0), metrics)
        metrics["loss"] = jnp.mean(loss)
        return jnp.mean(loss), metrics

    guard = config.train.nan_guard

    def train_step(params, opt_state, batch, epoch):
        (_, metrics), grads = jax.value_and_grad(mean_loss, has_aux=True)(params, batch)
        lr = lr_fn(epoch)
        if guard:
            # Grads are already psum-reduced (replicated), so ok is identical
            # on every device — the skip decision is globally consistent with
            # no extra collective.
            params, opt_state, ok = guarded_optimizer_step(
                tx, params, grads, opt_state, lr, metrics["loss"]
            )
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        else:
            params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
        metrics["lr"] = lr
        return params, opt_state, metrics

    repl = replicate_sharding(mesh)
    data = batch_shardings if batch_shardings is not None else batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
