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
from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss
from lanegcn_tpu.train.optimizer import apply_lr


def make_mesh(devices: Sequence[jax.Device] | None = None, data: int | None = None) -> Mesh:
    """1-D `data` mesh (graph/edge-partition axis arrives with the sharded
    LaneConv; see parallel/graph_shard.py)."""
    if devices is None:
        devices = jax.devices()
    if data is None:
        data = len(devices)
    return Mesh(np.asarray(devices[:data]).reshape(data), ("data",))


def stack_packs(packs: Sequence[PackedBatch]) -> PackedBatch:
    """Stack per-device packs into a global batch with leading axis G."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *packs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_parallel_train_step(config: Config, net: LaneGCN, tx, lr_fn, mesh: Mesh) -> Callable:
    """jit-compiled SPMD train step over stacked packs.

    fn(params, opt_state, batch[G, ...], epoch) → (params, opt_state, metrics)
    Loss = mean of per-pack losses (each normalized by its own support,
    matching horovod's average-of-local-losses gradient semantics,
    reference train.py:66-69); metric sums are summed across packs.
    """

    def loss_fn(params, batch):
        def per_pack(b):
            out = net.apply({"params": params}, b)
            losses = pred_loss(out, b, config.loss)
            m = dict(losses)
            m.update(agent_metrics(out, b))
            return losses["loss"], m

        loss, metrics = jax.vmap(per_pack)(batch)
        metrics = jax.tree.map(lambda x: jnp.sum(x, axis=0), metrics)
        metrics["loss"] = jnp.mean(loss)
        return jnp.mean(loss), metrics

    def train_step(params, opt_state, batch: PackedBatch, epoch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        lr = lr_fn(epoch)
        params = jax.tree.map(lambda p, u: p + u, params, apply_lr(updates, lr))
        metrics["lr"] = lr
        return params, opt_state, metrics

    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, data, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
