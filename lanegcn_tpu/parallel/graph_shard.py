"""Explicitly graph-parallel LaneConv: edge partitioning + ICI collectives.

The north-star scaling axis (SURVEY.md §2.6): the batched lane graph is too
big for pure data parallelism at pod scale, so the node set is sharded
contiguously across the mesh's `graph` axis and the 14-relation LaneConv
runs SPMD:

  per shard s (owning node rows [s·N/G, (s+1)·N/G)):
    H_r       = X_local @ W_r                  (MXU FLOPs split across shards)
    partial   = Σ_r scatter_add(H_r[v_local] → u_global)   (local edges only,
                edges partitioned by SOURCE owner)
    temp      = psum_scatter(partial, 'graph')  (one [N, C] reduce-scatter
                over ICI — the only communication per layer)
    X'_local  = ReLU(GN(temp + W_ctr X_local)) → Linear → residual

Numerics are identical to models.map_net.LaneConvStack (same params pytree),
verified in tests/test_graph_shard.py on a virtual CPU mesh.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lanegcn_tpu.config import ModelConfig, relation_names
from lanegcn_tpu.graph import EdgeSet
from lanegcn_tpu.ops import group_norm, masked_gather, scatter_add


def partition_edges_by_source(
    edges: Dict[str, EdgeSet], num_nodes: int, num_shards: int
) -> Dict[str, EdgeSet]:
    """Host-side: split every relation's edges by the owner shard of the
    SOURCE node v; v becomes shard-local, u stays pack-global. Returns
    EdgeSets with a leading shard axis [G, E_shard] (E_shard = padded max)."""
    assert num_nodes % num_shards == 0, (num_nodes, num_shards)
    rows = num_nodes // num_shards
    out = {}
    for name, e in edges.items():
        u = np.asarray(e.u)
        v = np.asarray(e.v)
        m = np.asarray(e.mask)
        owner = v // rows
        per_shard = []
        for s in range(num_shards):
            sel = m & (owner == s)
            per_shard.append((u[sel], v[sel] - s * rows))
        cap = max(max((len(a) for a, _ in per_shard), default=1), 1)
        su = np.zeros((num_shards, cap), np.int32)
        sv = np.zeros((num_shards, cap), np.int32)
        sm = np.zeros((num_shards, cap), bool)
        for s, (a, b) in enumerate(per_shard):
            su[s, : len(a)] = a
            sv[s, : len(a)] = b
            sm[s, : len(a)] = True
        out[name] = EdgeSet(u=su, v=sv, mask=sm)
    return out


def _lane_conv_layer_sharded(
    feat_local: jax.Array,  # [N/G, C]
    edges: Dict[str, EdgeSet],  # per-shard slices [E, ...]
    layer_params: Dict,
    names: Tuple[str, ...],
    num_nodes: int,
    axis: str,
) -> jax.Array:
    c = feat_local.shape[-1]
    w_rel = layer_params["rel_kernel"]
    h = jnp.einsum("nc,rcd->rnd", feat_local, w_rel)  # [R, N/G, C] — local FLOPs

    partial = jnp.zeros((num_nodes, c), feat_local.dtype)
    for r, name in enumerate(names):
        e = edges[name]
        msg = masked_gather(h[r], e.v, e.mask)
        partial = scatter_add(msg, e.u, num_nodes, mask=e.mask, out=partial)

    # One reduce-scatter over ICI: every shard receives the summed messages
    # for the node rows it owns.
    temp = jax.lax.psum_scatter(partial, axis, scatter_dimension=0, tiled=True)

    temp = temp + jnp.dot(feat_local, layer_params["ctr_kernel"])
    x = jax.nn.relu(
        group_norm(temp, layer_params["norm_weight"], layer_params["norm_bias"], 1)
    )
    x = jnp.dot(x, layer_params["ctr2_kernel"])
    x = group_norm(x, layer_params["ctr2_norm_weight"], layer_params["ctr2_norm_bias"], 1)
    return jax.nn.relu(x + feat_local)


def _extract_layer_params(stack_params: Dict, i: int) -> Dict:
    """Adapt a models.map_net.LaneConvStack params pytree layer i."""
    return {
        "ctr_kernel": stack_params[f"ctr_{i}"]["kernel"],
        "rel_kernel": stack_params[f"rel_kernel_{i}"],
        "norm_weight": stack_params[f"norm_{i}"]["weight"],
        "norm_bias": stack_params[f"norm_{i}"]["bias"],
        "ctr2_kernel": stack_params[f"ctr2_{i}"]["linear"]["kernel"],
        "ctr2_norm_weight": stack_params[f"ctr2_{i}"]["norm"]["weight"],
        "ctr2_norm_bias": stack_params[f"ctr2_{i}"]["norm"]["bias"],
    }


def partition_edge_set_by_source(
    edges: EdgeSet, num_src: int, num_shards: int
) -> EdgeSet:
    """Single EdgeSet variant of partition_edges_by_source (u stays global,
    v becomes source-shard-local; leading shard axis [G, E_shard])."""
    return partition_edges_by_source({"e": edges}, num_src, num_shards)["e"]


def _att_apply_sharded(
    params: Dict,
    agts_local: jax.Array,  # [A/G, C_a]
    agt_ctrs_full: jax.Array,  # [A, 2] (replicated — tiny)
    ctx_local: jax.Array,  # [Cn/G, C_c]
    ctx_ctrs_local: jax.Array,  # [Cn/G, 2]
    edges: EdgeSet,  # u → global agt rows, v → local ctx rows
    num_agts: int,
    axis: str,
) -> jax.Array:
    """One Att layer (reference lanegcn.py:662-710) with destinations (agts)
    and sources (ctx) row-sharded over `axis`; fusion edges partitioned by
    source shard. Per layer: one all_gather of the query rows ([A, C] — small)
    and one psum_scatter of the edge-message partial sums."""

    def linear_gn(p, x, act=True):
        y = jnp.dot(x, p["linear"]["kernel"])
        y = group_norm(y, p["norm"]["weight"], p["norm"]["bias"], 1)
        return jax.nn.relu(y) if act else y

    res = agts_local

    # Dense per-destination query, computed shard-locally then gathered so
    # edges (indexed by global u) can read any destination's query row.
    query_local = linear_gn(params["query"], agts_local)
    query_full = jax.lax.all_gather(query_local, axis, tiled=True)  # [A, C]

    d = masked_gather(agt_ctrs_full, edges.u, edges.mask) - masked_gather(
        ctx_ctrs_local, edges.v, edges.mask
    )
    dist = jax.nn.relu(
        jnp.dot(d, params["dist_dense"]["kernel"]) + params["dist_dense"]["bias"]
    )
    dist = linear_gn(params["dist_out"], dist)

    query_e = masked_gather(query_full, edges.u, edges.mask)
    ctx_e = masked_gather(ctx_local, edges.v, edges.mask)
    edge_in = jnp.concatenate([dist, query_e, ctx_e], axis=-1)
    edge_out = linear_gn(params["ctx_hidden"], edge_in)
    edge_out = jnp.dot(edge_out, params["ctx_out"]["kernel"])

    partial = scatter_add(edge_out, edges.u, num_agts, mask=edges.mask)
    msgs_local = jax.lax.psum_scatter(partial, axis, scatter_dimension=0, tiled=True)

    agts = jnp.dot(agts_local, params["agt"]["kernel"]) + msgs_local
    agts = jax.nn.relu(group_norm(agts, params["norm"]["weight"], params["norm"]["bias"], 1))
    agts = linear_gn(params["linear"], agts, act=False)
    return jax.nn.relu(agts + res)


def make_sharded_att(mesh: Mesh, num_agts: int, axis: str = "graph"):
    """Returns fn(att_params, agts [A, C_a], agt_ctrs [A, 2], ctx [Cn, C_c],
    ctx_ctrs [Cn, 2], sharded_edges) → [A, C_a]: one fusion Att layer
    edge-partitioned over the mesh `axis`; params = models.fusion.Att pytree."""

    def per_shard(params, agts, agt_ctrs, ctx, ctx_ctrs, edges_sharded):
        edges = jax.tree.map(lambda x: x[0], edges_sharded)
        return _att_apply_sharded(
            params, agts, agt_ctrs, ctx, ctx_ctrs, edges, num_agts, axis
        )

    in_specs = (P(), P(axis), P(), P(axis), P(axis), P(axis))
    shard_fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=in_specs, out_specs=P(axis), check_vma=False
    )
    return jax.jit(shard_fn)


def make_sharded_lane_conv(
    cfg: ModelConfig,
    mesh: Mesh,
    num_nodes: int,
    num_layers: int = 4,
    axis: str = "graph",
):
    """Returns fn(stack_params, feat [N, C], sharded_edges) → [N, C] running
    the LaneConv stack edge-partitioned over the mesh `axis`. stack_params is
    a models.map_net.LaneConvStack params pytree (numerics match exactly)."""
    names = relation_names(cfg.num_scales)
    num_shards = mesh.shape[axis]

    def per_shard(stack_params, feat_local, edges_sharded):
        # Edge leaves arrive as [1, E] blocks of the [G, E] arrays.
        edges_local = jax.tree.map(lambda x: x[0], edges_sharded)
        x = feat_local
        for i in range(num_layers):
            lp = _extract_layer_params(stack_params, i)
            x = _lane_conv_layer_sharded(x, edges_local, lp, names, num_nodes, axis)
        return x

    in_specs = (
        P(),  # params replicated
        P(axis),  # node features row-sharded
        {nm: P(axis) for nm in names},  # per-shard edge slices (pytree prefix)
    )
    shard_fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(shard_fn)
