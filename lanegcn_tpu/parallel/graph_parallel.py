"""Explicit graph-parallel LaneGCN train step: shard_map over (data × graph).

Why this exists (measured, tools/collective_audit.py): letting GSPMD infer
the graph-axis layout for the full train step inserts ~1,113 collectives
moving ~246 MB per step on a (data=2, graph=2) virtual mesh — mostly
collective-permutes and all-to-alls resharding every indexed gather over the
sharded node/actor arrays. The explicit edge-partitioned kernels
(parallel/graph_shard.py) spend 44 collectives / 13 MB for the same model:
one psum_scatter per LaneConv layer, one all_gather + one psum_scatter per
Att. This module composes those kernels into the FULL model + loss +
optimizer step, so `--mesh DxG` runs the explicit path end to end.

Layout:
- mesh ("data", "graph"): each data row owns one pack; each graph column
  owns a contiguous 1/G slice of that pack's node rows and actor rows.
- batch inputs are replicated within a pack's graph group (they are small —
  the big arrays are the activations, which live sharded); every device
  slices its own rows. Edges are partitioned by SOURCE shard on host
  (partition_stacked_edges) so message gathers are shard-local and the only
  per-layer communication is the psum_scatter of destination partial sums.
- loss/metrics: per-shard outputs are all_gather'd (small: [A, K·T·2]) and
  fed to the UNCHANGED pred_loss/agent_metrics — semantics identical to the
  single-device step by construction; the all_gather's VJP (psum_scatter)
  routes cotangents back to the owning shards.
- gradients: pmean over "graph" then pmean over "data". The graph-axis
  mean (not sum) is load-bearing: the loss is recomputed identically on
  every graph shard from the all_gather'd cls/reg, and all_gather's VJP
  (psum_scatter) SUMS those G identical cotangents — so each shard's local
  gradient contribution already carries a factor of G. Summing shard
  contributions would yield G x the true per-pack gradient (invisible under
  Adam's scale invariance, wrong under sgd/clip_grads); the mean cancels the
  factor exactly. The data-axis mean matches make_parallel_train_step and
  horovod's averaging (reference train.py:66-69).

This path consumes FLAT packs (pack_batch(split_bands=False,
split_tables=False)): the band/table/Pallas fusions assume pack-contiguous
rows and are the single-chip fast path; at multi-chip scale the collective
structure dominates. The param tree is identical either way, so checkpoints
transfer between paths.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lanegcn_tpu.config import Config, relation_names
from lanegcn_tpu.graph import EdgeSet, PackedBatch
from lanegcn_tpu.models.actor_net import ActorNet
from lanegcn_tpu.models.lanegcn import agent_metrics, pred_loss
from lanegcn_tpu.models.pred_net import PredNet
from lanegcn_tpu.ops import group_norm
from lanegcn_tpu.parallel.graph_shard import (
    _att_apply_sharded,
    _extract_layer_params,
    _lane_conv_layer_sharded,
)
from lanegcn_tpu.train.optimizer import guarded_optimizer_step, optimizer_step


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def shard_edge_capacity(capacity: int, num_shards: int, slack: float = 2.0) -> int:
    """Static per-shard edge capacity: E/G with skew slack, 128-aligned."""
    return min(capacity, _round_up(int(np.ceil(capacity / num_shards * slack)), 128))


def _partition_one(
    e: EdgeSet, n_src: int, num_shards: int, cap: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split one edge list by the owner shard of the SOURCE node v.
    v becomes shard-local; u stays pack-global. A skewed batch that
    overflows a shard's capacity drops the tail edges (returned in the
    dropped count) instead of killing the run — the caller logs it; raise
    --edge-shard-slack if it recurs."""
    rows = n_src // num_shards
    u = np.asarray(e.u)
    v = np.asarray(e.v)
    m = np.asarray(e.mask)
    owner = np.where(m, v // rows, 0)
    su = np.zeros((num_shards, cap), np.int32)
    sv = np.zeros((num_shards, cap), np.int32)
    sm = np.zeros((num_shards, cap), bool)
    dropped = 0
    for s in range(num_shards):
        sel = m & (owner == s)
        k = int(sel.sum())
        if k > cap:
            dropped += k - cap
            k = cap
        su[s, :k] = u[sel][:k]
        sv[s, :k] = v[sel][:k] - s * rows
        sm[s, :k] = True
    return su, sv, sm, dropped


def partition_pack_edges(
    batch: PackedBatch, config: Config, num_shards: int, slack: float = 2.0
) -> Dict:
    """Host-side: partition ONE flat pack's edges by source shard.

    Returns {"graph": {rel: EdgeSet}, "a2m": ..., "m2a": ..., "a2a": ...}
    with leading axes [G, cap] plus a "dropped_edges" int. Sources: graph
    relations + m2a → lane nodes; a2m + a2a → actors. Per-pack so the
    loader's pack workers can run it off the step critical path
    (cli.py wires it into the packer)."""
    names = relation_names(config.model.num_scales)
    n_nodes = config.pack.max_nodes
    n_actors = config.pack.max_actors * config.pack.max_scenarios
    dropped_total = 0

    def one_rel(e, n_src):
        nonlocal dropped_total
        cap = shard_edge_capacity(e.u.shape[-1], num_shards, slack)
        su, sv, sm, dropped = _partition_one(e, n_src, num_shards, cap)
        dropped_total += dropped
        return EdgeSet(u=su, v=sv, mask=sm)

    out: Dict = {"graph": {}}
    for nm in names:
        e = batch.graph.edges[nm]
        out["graph"][nm] = one_rel(EdgeSet(u=e.u, v=e.v, mask=e.mask), n_nodes)
    for key, e, n_src in (
        ("a2m", batch.fusion.a2m, n_actors),
        ("m2a", batch.fusion.m2a, n_nodes),
        ("a2a", batch.fusion.a2a, n_actors),
    ):
        out[key] = one_rel(EdgeSet(u=e.u, v=e.v, mask=e.mask), n_src)
    out["dropped_edges"] = dropped_total
    return out


def stack_pack_edges(parts) -> Dict:
    """Stack per-pack partition_pack_edges outputs into [D, G, cap] arrays;
    logs a warning if any pack dropped overflow edges."""
    dropped = sum(p.pop("dropped_edges", 0) for p in parts)
    if dropped:
        print(
            f"WARNING: edge-shard overflow dropped {dropped} edges this step "
            f"(skewed batch; raise --edge-shard-slack)"
        )
    return jax.tree.map(lambda *xs: np.stack(xs), *parts)


def partition_stacked_edges(
    batch: PackedBatch, config: Config, num_shards: int, slack: float = 2.0
) -> Dict:
    """Host-side: partition a STACKED flat batch's edges by source shard.

    Returns {"graph": {rel: (u, v, mask)}, "a2m": ..., "m2a": ..., "a2a": ...}
    with leading axes [D, G, cap]. Composed from per-pack
    partition_pack_edges (production runs that per pack on loader workers).
    """
    d = batch.rot.shape[0]
    parts = [
        partition_pack_edges(
            jax.tree.map(lambda x: np.asarray(x)[i], batch),
            config, num_shards, slack,
        )
        for i in range(d)
    ]
    return stack_pack_edges(parts)


def sharded_edge_specs(sharded_edges) -> object:
    """P("data", "graph") for every leaf of partition_stacked_edges output."""
    return jax.tree.map(lambda _: P("data", "graph"), sharded_edges)


def _dense_p(p, x):
    y = jnp.dot(x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def _linear_gn(p, x, act=True):
    y = jnp.dot(x, p["linear"]["kernel"])
    y = group_norm(y, p["norm"]["weight"], p["norm"]["bias"], 1)
    return jax.nn.relu(y) if act else y


def _rows(x, sid, size):
    return jax.lax.dynamic_slice_in_dim(x, sid * size, size, axis=0)


def _forward_local(params, pack, se, cfg, sid, num_shards: int, axis: str):
    """Per-device LaneGCN forward on its node/actor row slice; returns the
    FULL gathered outputs {"cls" [A, K], "reg" [A, K, T, 2]} (world frame).
    Mirrors models/lanegcn.py LaneGCN.__call__ stage by stage."""
    mcfg = cfg.model
    n_nodes = pack.graph.ctrs.shape[0]
    n_actors = pack.actors.ctrs.shape[0]
    names = relation_names(mcfg.num_scales)

    n_loc = n_nodes // num_shards
    a_loc = n_actors // num_shards

    # ActorNet on local actor rows (row-independent conv FPN).
    feats_loc = _rows(pack.actors.feats, sid, a_loc)
    actors = ActorNet(mcfg).apply({"params": params["actor_net"]}, feats_loc)

    # MapNet: input/seg embeds on local node rows + sharded LaneConv stack.
    mp = params["map_net"]
    ctrs_loc = _rows(pack.graph.ctrs, sid, n_loc)
    segs_loc = _rows(pack.graph.feats, sid, n_loc)
    ctr_emb = _linear_gn(mp["input_out"], jax.nn.relu(_dense_p(mp["input_dense"], ctrs_loc)), act=False)
    seg_emb = _linear_gn(mp["seg_out"], jax.nn.relu(_dense_p(mp["seg_dense"], segs_loc)), act=False)
    nodes = jax.nn.relu(ctr_emb + seg_emb)
    for i in range(mcfg.num_fuse_layers):
        nodes = _lane_conv_layer_sharded(
            nodes, se["graph"], _extract_layer_params(mp["fuse"], i), names, n_nodes, axis
        )

    # A2M: meta concat on local node rows, then sharded Att (dest = nodes).
    meta = jnp.concatenate(
        [
            _rows(pack.graph.turn, sid, n_loc),
            _rows(pack.graph.control, sid, n_loc)[:, None],
            _rows(pack.graph.intersect, sid, n_loc)[:, None],
        ],
        axis=-1,
    )
    nodes = _linear_gn(
        params["a2m"]["meta"], jnp.concatenate([nodes, meta.astype(nodes.dtype)], axis=-1)
    )
    actor_ctrs_loc = _rows(pack.actors.ctrs, sid, a_loc)
    for i in range(mcfg.num_att_layers):
        nodes = _att_apply_sharded(
            params["a2m"][f"att{i}"], nodes, pack.graph.ctrs, actors,
            actor_ctrs_loc, se["a2m"], n_nodes, axis,
        )

    # M2M: sharded LaneConv stack (no embeds).
    for i in range(mcfg.num_fuse_layers):
        nodes = _lane_conv_layer_sharded(
            nodes, se["graph"], _extract_layer_params(params["m2m"]["fuse"], i),
            names, n_nodes, axis,
        )

    # M2A (dest = actors, src = nodes), then A2A.
    node_ctrs_loc = _rows(pack.graph.ctrs, sid, n_loc)
    for i in range(mcfg.num_att_layers):
        actors = _att_apply_sharded(
            params["m2a"][f"att{i}"], actors, pack.actors.ctrs, nodes,
            node_ctrs_loc, se["m2a"], n_actors, axis,
        )
    for i in range(mcfg.num_att_layers):
        actors = _att_apply_sharded(
            params["a2a"][f"att{i}"], actors, pack.actors.ctrs, actors,
            actor_ctrs_loc, se["a2a"], n_actors, axis,
        )

    # PredNet on local actor rows + world transform.
    cls, reg = PredNet(mcfg).apply(
        {"params": params["pred_net"]}, actors, actor_ctrs_loc
    )
    scen_loc = _rows(pack.actors.scen, sid, a_loc)
    rot = jnp.take(pack.rot, scen_loc, axis=0)
    orig = jnp.take(pack.orig, scen_loc, axis=0)
    reg = jnp.einsum("aktc,acd->aktd", reg.astype(jnp.float32), rot) + orig[:, None, None, :]

    # Gather the small outputs so loss/metrics run UNCHANGED (their VJP
    # psum_scatters cotangents back to the owning shard).
    cls_full = jax.lax.all_gather(cls.astype(jnp.float32), axis, tiled=True)
    reg_full = jax.lax.all_gather(reg, axis, tiled=True)
    return {"cls": cls_full, "reg": reg_full}


def make_explicit_parallel_train_step(
    config: Config, tx, lr_fn, mesh: Mesh, loss_fn=None, metrics_fn=None
):
    """jit(shard_map) train step over a (data × graph) mesh.

    fn(params, opt_state, batch[D, ...], sharded_edges, epoch) →
    (params, opt_state, metrics); batch is a stacked FLAT pack, sharded_edges
    from partition_stacked_edges. Loss/metric semantics match
    make_parallel_train_step exactly (mean of per-pack losses; summed metric
    supports).
    """
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics
    guard = config.train.nan_guard
    num_shards = mesh.shape["graph"]

    def per_device(params, opt_state, batch, sharded_edges, epoch):
        pack = jax.tree.map(lambda x: jnp.squeeze(x, 0), batch)
        se = jax.tree.map(lambda x: jnp.squeeze(jnp.squeeze(x, 0), 0), sharded_edges)
        sid = jax.lax.axis_index("graph")

        def objective(p):
            out = _forward_local(p, pack, se, config, sid, num_shards, "graph")
            losses = loss_fn(out, pack, config.loss)
            m = dict(losses)
            m.update(metrics_fn(out, pack))
            return losses["loss"], m

        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(params)
        # pmean (not psum) over "graph": each shard's contribution is already
        # G x its true share because the replicated loss's cotangents are
        # summed by all_gather's VJP — see the module docstring. Then mean
        # over packs.
        grads = jax.tree.map(
            lambda x: jax.lax.pmean(jax.lax.pmean(x, "graph"), "data"), grads
        )
        loss_mean = jax.lax.pmean(metrics["loss"], "data")
        metrics = {
            k: (jax.lax.psum(v, "data") if k != "loss" else loss_mean)
            for k, v in metrics.items()
        }
        lr = lr_fn(epoch)
        if guard:
            params, opt_state, ok = guarded_optimizer_step(
                tx, params, grads, opt_state, lr, loss_mean
            )
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        else:
            params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
        metrics["lr"] = lr
        return params, opt_state, metrics

    batch_spec = P("data")
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, P("data", "graph"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# LaneRCNN explicit graph-parallel path (reference trains LaneRCNN
# distributed via horovod / torch DDP — train_lanercnn.py,
# train_lrcnn_torch.py:119-124; here the RoI-node and global-node row sets
# shard over the mesh "graph" axis with the same edge-partitioned kernels
# the LaneGCN path uses).
# ---------------------------------------------------------------------------


def partition_roi_pack_edges(
    batch, config: Config, num_shards: int, slack: float = 2.0
) -> Dict:
    """Host-side: partition ONE flat RoiPackedBatch's edges for the explicit
    shard_map step. The LOCAL endpoint per edge family:

      roi relations  v (source)    — roi-node rows [M]
      global rels    v (source)    — global-node rows [N]
      a2m            v (dest!)     — roi-node rows (sources are the small
                                     replicated agent array, so partitioning
                                     by destination makes the scatter
                                     shard-local with zero communication)
      r2g            v (source)    — roi-node rows
      g2r            v (source)    — global-node rows

    a2r (decode) stays replicated — Decode runs replicated on the gathered
    RoI features. Returns leading axes [G, cap] + "dropped_edges"."""
    m_cap = batch.node_feats.shape[0]
    n_cap = batch.graph.ctrs.shape[0]
    dropped_total = 0

    def one(e: EdgeSet, n_src: int, swap: bool = False) -> EdgeSet:
        nonlocal dropped_total
        # swap: partition by u instead of v (u becomes shard-local).
        u, v = (e.v, e.u) if swap else (e.u, e.v)
        cap = shard_edge_capacity(e.u.shape[-1], num_shards, slack)
        su, sv, sm, dropped = _partition_one(
            EdgeSet(u=u, v=v, mask=e.mask), n_src, num_shards, cap
        )
        dropped_total += dropped
        if swap:
            su, sv = sv, su
        return EdgeSet(u=su, v=sv, mask=sm)

    out: Dict = {"roi": {}, "global": {}}
    for nm, e in batch.edges.items():
        out["roi"][nm] = one(e, m_cap)
    for nm, e in batch.graph.edges.items():
        out["global"][nm] = one(e, n_cap)
    # a2m: u → RoI rows (context), v → roi-node rows (dest). Partition so V
    # becomes local: _partition_one localizes the v slot, so feed it as-is.
    out["a2m"] = one(batch.a2m, m_cap)
    out["r2g"] = one(batch.r2g, m_cap)
    out["g2r"] = one(batch.g2r, n_cap)
    out["dropped_edges"] = dropped_total
    return out


def _pool_apply_sharded(
    p: Dict,
    ctx_local: jax.Array,  # [Cn/G, C] context features (sharded rows)
    ctx_pose_local: jax.Array,  # [Cn/G, 4]
    tgt_local: jax.Array,  # [Tn/G, C] target features (sharded rows)
    tgt_pose_full: jax.Array,  # [Tn, 4] (replicated — from the batch)
    e: EdgeSet,  # v → local ctx rows, u → global tgt rows
    num_tgt: int,
    axis: str,
):
    """One LanePooling stage (models/lanercnn.py:82-148) with context and
    target rows sharded over `axis`; edges partitioned by context (source)
    shard. Communication: one psum_scatter of the per-edge message partial
    sums — the same pattern as _att_apply_sharded."""
    n = tgt_local.shape[-1]
    from lanegcn_tpu.ops import masked_gather, scatter_add

    d = masked_gather(tgt_pose_full, e.u, e.mask)
    d = (
        jnp.where(e.mask[:, None], masked_gather(ctx_pose_local, e.v, e.mask), 0)
        - jnp.where(e.mask[:, None], d, 0)
    )
    dist = jax.nn.relu(
        jnp.dot(d, p["relpose"]["kernel"]) + p["relpose"]["bias"]
    )
    k_ch = p["ctx_hidden"]["linear"]["kernel"]
    cg = masked_gather(jnp.dot(ctx_local, k_ch[:n]), e.v, e.mask)
    z = cg + jnp.dot(dist, k_ch[n:])
    ctx = jax.nn.relu(
        group_norm(
            z,
            p["ctx_hidden"]["norm"]["weight"],
            p["ctx_hidden"]["norm"]["bias"],
            1,
        )
    )
    ctx = jnp.dot(ctx, p["ctx_out"]["kernel"])
    partial = scatter_add(ctx, e.u, num_tgt, mask=e.mask)
    msgs_local = jax.lax.psum_scatter(partial, axis, scatter_dimension=0, tiled=True)

    tgt = jnp.dot(tgt_local, p["input"]["kernel"]) + msgs_local
    tgt = jax.nn.relu(group_norm(tgt, p["norm"]["weight"], p["norm"]["bias"], 1))
    tgt = _linear_gn(p["mlp1"], tgt)
    tgt = _linear_gn(p["mlp2"], tgt, act=False)
    return jax.nn.relu(tgt + tgt_local)


def _lanercnn_forward_local(params, pack, se, cfg, sid, num_shards: int, axis: str):
    """Per-device LaneRCNN forward on its roi-node / global-node row slices;
    Decode runs replicated on the all_gather'd RoI features and returns the
    full outputs. Mirrors models/lanercnn.py LaneRCNN.__call__."""
    from lanegcn_tpu.models.lanercnn import Decode
    from lanegcn_tpu.ops import masked_gather, scatter_add

    mcfg = cfg.model
    names = relation_names(mcfg.num_scales)
    m_cap = pack.node_feats.shape[0]
    n_cap = pack.graph.ctrs.shape[0]
    m_loc = m_cap // num_shards
    n_loc = n_cap // num_shards

    # LaneInput: map embed on local roi-node rows; agent features are small
    # and replicated; the a2m scatter is shard-local (edges partitioned by
    # destination).
    pi = params["input"]
    nf_loc = _rows(pack.node_feats, sid, m_loc)
    feat = jnp.dot(nf_loc, pi["map_fc"]["kernel"])
    agt = jnp.dot(pack.agent_feat, pi["agt_fc"]["kernel"])
    ea = se["a2m"]
    msg = masked_gather(agt, ea.u, ea.mask)
    feat = scatter_add(msg, ea.v, m_loc, mask=ea.mask, out=feat)
    feat = jax.nn.relu(group_norm(feat, pi["bn"]["weight"], pi["bn"]["bias"], 1))

    def roi_stack(pp, x):
        x = _linear_gn(pp["input"], x)
        for i in range(mcfg.num_fuse_layers):
            x = _lane_conv_layer_sharded(
                x, se["roi"], _extract_layer_params(pp["fuse"], i), names, m_cap, axis
            )
        return x

    feat = roi_stack(params["roi_net1"], feat)

    # Interactor: global-graph embed on local rows, pooling both ways,
    # global LaneConv stack — all sharded.
    it = params["interactor"]
    g_ctrs_loc = _rows(pack.graph.ctrs, sid, n_loc)
    g_feats_loc = _rows(pack.graph.feats, sid, n_loc)
    emb = _linear_gn(it["input_out"], jax.nn.relu(_dense_p(it["input_dense"], g_ctrs_loc)), act=False)
    seg = _linear_gn(it["seg_out"], jax.nn.relu(_dense_p(it["seg_dense"], g_feats_loc)), act=False)
    graph_feat0 = jax.nn.relu(emb + seg)

    roi_pose_loc = nf_loc[:, :4]
    graph_pose_full = jnp.concatenate([pack.graph.ctrs, pack.graph.feats], axis=-1)
    roi_pose_full = pack.node_feats[:, :4]

    graph_feat = _pool_apply_sharded(
        it["roi2graph"], feat, roi_pose_loc, graph_feat0, graph_pose_full,
        se["r2g"], n_cap, axis,
    )
    for i in range(mcfg.num_fuse_layers):
        graph_feat = _lane_conv_layer_sharded(
            graph_feat, se["global"], _extract_layer_params(it["global_graph"], i),
            names, n_cap, axis,
        )
    graph_pose_loc = jnp.concatenate([g_ctrs_loc, g_feats_loc], axis=-1)
    feat = _pool_apply_sharded(
        it["graph2roi"], graph_feat, graph_pose_loc, feat, roi_pose_full,
        se["g2r"], m_cap, axis,
    )

    feat = roi_stack(params["roi_net2"], feat)

    # Decode replicated on the gathered RoI features (runs once per step —
    # its work is interest-node sized, far below the per-layer stacks).
    roi_full = jax.lax.all_gather(feat, axis, tiled=True)
    logits, goals, trajs = Decode(mcfg).apply(
        {"params": params["decode"]}, roi_full, pack
    )
    return {
        "pred_logics": logits.astype(jnp.float32),
        "pred_goals": goals.astype(jnp.float32),
        "pred_trajs": trajs.astype(jnp.float32),
    }


def make_explicit_parallel_roi_train_step(
    config: Config, tx, lr_fn, mesh: Mesh, loss_fn, metrics_fn
):
    """jit(shard_map) LaneRCNN train step over a (data × graph) mesh.

    fn(params, opt_state, batch[D, ...], sharded_edges, epoch) →
    (params, opt_state, metrics). Same gradient semantics as
    make_explicit_parallel_train_step: pmean over "graph" (the replicated
    Decode/loss path's cotangents are G-fold summed by all_gather's VJP),
    pmean over "data"."""
    guard = config.train.nan_guard
    num_shards = mesh.shape["graph"]

    def per_device(params, opt_state, batch, sharded_edges, epoch):
        pack = jax.tree.map(lambda x: jnp.squeeze(x, 0), batch)
        se = jax.tree.map(lambda x: jnp.squeeze(jnp.squeeze(x, 0), 0), sharded_edges)
        sid = jax.lax.axis_index("graph")

        def objective(p):
            out = _lanercnn_forward_local(
                p, pack, se, config, sid, num_shards, "graph"
            )
            losses = loss_fn(out, pack, config.loss)
            m = dict(losses)
            m.update(metrics_fn(out, pack))
            return losses["loss"], m

        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(params)
        grads = jax.tree.map(
            lambda x: jax.lax.pmean(jax.lax.pmean(x, "graph"), "data"), grads
        )
        loss_mean = jax.lax.pmean(metrics["loss"], "data")
        metrics = {
            k: (jax.lax.psum(v, "data") if k != "loss" else loss_mean)
            for k, v in metrics.items()
        }
        lr = lr_fn(epoch)
        if guard:
            params, opt_state, ok = guarded_optimizer_step(
                tx, params, grads, opt_state, lr, loss_mean
            )
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        else:
            params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
        metrics["lr"] = lr
        return params, opt_state, metrics

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data", "graph"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0, 1))
