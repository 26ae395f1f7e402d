"""The actor-map fusion cycle: Att, A2M, M2M, M2A, A2A.

(reference lanegcn.py:366-545, 634-710)

`Att` is the shared sparse distance-gated attention kernel: for every fusion
edge (u ← v) within a distance threshold, an edge MLP consumes the relative
offset, a query projection of the destination, and the source feature; edge
outputs scatter-add into the destination, followed by GN → ReLU → Linear →
residual → ReLU.

TPU-first differences from the reference:
- fusion edges are precomputed on host into static-capacity EdgeSets
  (centers are data-time constants, so the thresholding is exact — reference
  builds them on-GPU per forward, lanegcn.py:672-689);
- the query projection runs densely per destination row and is gathered
  (row-wise ops commute with gather);
- padding edges are dropped by the deterministic scatter, so the edge MLP's
  bias terms never leak into real rows.

Behavioral note: the reference has a separate code path when the context set
is empty (lanegcn.py:664-670) that skips the GroupNorm; with packed batches a
context is never empty in practice (a pack with zero lane nodes is not a
meaningful input), so only the main path is implemented.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import ModelConfig
from lanegcn_tpu.graph import EdgeSet, LaneGraphBatch, PairPlan
from lanegcn_tpu.ops.pallas_win_edge import win_edge_mlp
from lanegcn_tpu.models.layers import (
    Dense,
    DenseParams,
    GroupNorm,
    Linear,
    LinearParams,
    SplitLinear,
    _BareGN,
)
from lanegcn_tpu.models.map_net import LaneConvStack, _graph_plan
from lanegcn_tpu.ops import masked_gather, scatter_add
from lanegcn_tpu.ops.pallas_edge_mlp import fused_edge_mlp
from lanegcn_tpu.ops.pallas_row_tail import fused_row_tail
from lanegcn_tpu.ops.table_gather import sorted_transpose_gather


def _edge_gather(x, idx, mask, inv_perm, inv_dst, zero_masked=True):
    """Feature gather over edges: sorted-transpose VJP when the packer
    provided the inverse order, plain masked gather otherwise.
    zero_masked=False skips the [E, C] padding select — pass it ONLY when
    the gathered rows feed a masked destination scatter (see
    sorted_transpose_gather)."""
    if inv_perm is not None:
        return sorted_transpose_gather(x, idx, mask, inv_perm, inv_dst,
                                       zero_masked=zero_masked)
    if not zero_masked:
        return masked_gather(x, idx, None)
    return masked_gather(x, idx, mask)


def use_pallas_edge(mode: str) -> bool:
    """Same mode semantics as LaneConvStack's pallas_bands."""
    if mode == "auto":
        return jax.default_backend() in ("tpu", "axon")
    return mode in ("on", "interpret")


def resolve_pallas_mode(mode: str) -> str:
    """Resolve a pallas_edge mode flag to a concrete kernel mode:
    "auto" → "on" on TPU backends else "xla"; anything that isn't a
    kernel mode → "xla". Single source of truth for every call site that
    passes a mode string straight to a Pallas op."""
    if mode == "auto":
        return "on" if jax.default_backend() in ("tpu", "axon") else "xla"
    return mode if mode in ("on", "interpret") else "xla"


class Att(nn.Module):
    """Distance-gated sparse attention (reference lanegcn.py:634-710).

    With destination-sorted edges (EdgeSet.dst_sorted, the packer default)
    the aggregation scatter runs with indices_are_sorted, the query
    gather's backward reuses the same sorted destination order, and the
    context gather's backward uses the packer's source-sorted inverse —
    no unsorted XLA scatter appears anywhere in the layer's autodiff."""

    n_agt: int
    n_ctx: int
    dtype: Any = jnp.float32
    pallas_edge: str = "auto"

    @nn.compact
    def __call__(
        self,
        agts: jax.Array,  # [A, n_agt] destination features
        agt_ctrs: jax.Array,  # [A, 2]
        ctx: jax.Array,  # [C, n_ctx] source features
        ctx_ctrs: jax.Array,  # [C, 2]
        edges: EdgeSet,  # u → agts rows, v → ctx rows
        pair: PairPlan | None = None,  # window-pair plan of the SAME edges
    ) -> jax.Array:
        res = agts
        num_agts = agts.shape[0]

        if pair is not None and self.n_agt == self.n_ctx:
            # Window-pair fused path (ops/pallas_win_edge): the dist
            # embedding is affine in the endpoint centers (d@Wd = ctr_u@Wd −
            # ctr_v@Wd), so every per-edge input folds into dense per-row
            # projections and the gathers + edge MLP + destination scatter
            # run in one kernel over (dst-window, src-window) chunk pairs —
            # no [E, C] HBM round-trips. Same param tree as the other
            # branches (checkpoint-compatible).
            c = self.n_ctx
            dt = self.dtype
            kd, bd = DenseParams(2, c, name="dist_dense")()
            kdo, gdow, gdob = LinearParams(c, c, name="dist_out")()
            k_ch, gchw, gchb = LinearParams(3 * c, self.n_agt, name="ctx_hidden")()
            kout, _ = DenseParams(self.n_agt, self.n_agt, use_bias=False, name="ctx_out")()
            query_all = Linear(self.n_ctx, dtype=dt, name="query")(agts)
            pd = jnp.dot(agt_ctrs.astype(dt), kd.astype(dt))
            ps = -jnp.dot(ctx_ctrs.astype(dt), kd.astype(dt))
            qd = jnp.dot(query_all.astype(dt), k_ch[c : 2 * c].astype(dt))
            cs = jnp.dot(ctx.astype(dt), k_ch[2 * c :].astype(dt))
            temp = Dense(self.n_agt, use_bias=False, dtype=dt, name="agt")(agts)
            mode = resolve_pallas_mode(self.pallas_edge)
            agts = win_edge_mlp(
                pd, qd, ps, cs, temp.astype(dt), bd, kdo, gdow, gdob,
                k_ch[:c], gchw, gchb, kout, pair,
                has_dist2=True, has_query=True, mode=mode,
            )
            return self._tail(agts, res)

        srt = edges.dst_sorted

        # Per-edge relative offset → dist embedding (ctrs are batch data —
        # no gradient path, plain gathers suffice).
        d = masked_gather(agt_ctrs, edges.u, edges.mask) - masked_gather(
            ctx_ctrs, edges.v, edges.mask
        )

        # Dense per-row query, projected by its ctx_hidden kernel slice
        # BEFORE the edge gather. u is the sort key, so its transpose order
        # is the identity.
        query_all = Linear(self.n_ctx, dtype=self.dtype, name="query")(agts)
        if srt:
            e = edges.capacity
            u_sent = jnp.where(edges.mask, edges.u, num_agts)
            gather_q = lambda rows: sorted_transpose_gather(
                rows, edges.u, edges.mask,
                jnp.arange(e, dtype=jnp.int32), u_sent,
            )
        else:
            gather_q = lambda rows: masked_gather(rows, edges.u, edges.mask)
        gather_c = lambda rows: _edge_gather(
            rows, edges.v, edges.mask, edges.inv_perm, edges.inv_dst
        )

        fused = use_pallas_edge(self.pallas_edge) and self.n_agt == self.n_ctx
        if fused:
            # Same param tree as the unfused branch (checkpoint-compatible);
            # the per-edge chain runs in ops/pallas_edge_mlp.fused_edge_mlp
            # so the [E, C] intermediates stay in VMEM.
            c = self.n_ctx
            kd, bd = DenseParams(2, c, name="dist_dense")()
            kdo, gdow, gdob = LinearParams(c, c, name="dist_out")()
            k_ch, gchw, gchb = LinearParams(3 * c, self.n_agt, name="ctx_hidden")()
            kout, _ = DenseParams(self.n_agt, self.n_agt, use_bias=False, name="ctx_out")()
            qg = gather_q(
                jnp.dot(query_all.astype(self.dtype), k_ch[c : 2 * c].astype(self.dtype))
            )
            cg = gather_c(
                jnp.dot(ctx.astype(self.dtype), k_ch[2 * c :].astype(self.dtype))
            )
            edge_out = fused_edge_mlp(
                d, qg, cg, kd, bd, kdo, gdow, gdob, k_ch[:c], gchw, gchb, kout,
                True, True, 1e-5, self.pallas_edge == "interpret",
            )
        else:
            dist = Dense(self.n_ctx, dtype=self.dtype, name="dist_dense")(d)
            dist = Linear(self.n_ctx, dtype=self.dtype, name="dist_out")(nn.relu(dist))

            # ctx_hidden = Linear over concat([dist, query, ctx]); the query
            # and ctx segments are per-row functions, so their kernel slices
            # apply densely at row count (A and C rows) instead of edge count
            # E — exact factorization, same param tree (reference
            # lanegcn.py:693-700).
            edge_out = SplitLinear(
                self.n_agt,
                widths=(self.n_ctx, self.n_ctx, self.n_ctx),
                dtype=self.dtype,
                name="ctx_hidden",
            )([(dist, None), (query_all, gather_q), (ctx, gather_c)])
            edge_out = Dense(self.n_agt, use_bias=False, dtype=self.dtype, name="ctx_out")(edge_out)

        agts = Dense(self.n_agt, use_bias=False, dtype=self.dtype, name="agt")(agts)
        agts = scatter_add(
            edge_out, edges.u, num_agts, mask=edges.mask, out=agts,
            indices_are_sorted=srt,
        )
        return self._tail(agts, res)

    def _tail(self, agts: jax.Array, res: jax.Array) -> jax.Array:
        """GN → ReLU → Linear → GN → +res → ReLU (reference
        lanegcn.py:704-710).  On TPU the whole chain runs in the fused
        row-tail Pallas kernel (ops/pallas_row_tail) — one HBM read of
        agts/res, one write of the output; identical param tree either
        way (norm/* + linear/{linear/kernel, norm/*})."""
        mode = resolve_pallas_mode(self.pallas_edge)
        if mode != "xla":
            g1w, g1b = _BareGN(self.n_agt, name="norm")()
            k, g2w, g2b = LinearParams(self.n_agt, self.n_agt, name="linear")()
            return fused_row_tail(
                agts.astype(self.dtype), res.astype(self.dtype),
                k, g1w, g1b, g2w, g2b, mode=mode,
            )
        agts = nn.relu(GroupNorm(name="norm")(agts))
        agts = Linear(self.n_agt, act=False, dtype=self.dtype, name="linear")(agts)
        return nn.relu(agts + res)


class A2M(nn.Module):
    """Actor → lane-node fusion (reference lanegcn.py:366-407)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        nodes: jax.Array,
        graph: LaneGraphBatch,
        actors: jax.Array,
        actor_ctrs: jax.Array,
        a2m_edges: EdgeSet,
        pair: PairPlan | None = None,
    ) -> jax.Array:
        meta = jnp.concatenate(
            [graph.turn, graph.control[:, None], graph.intersect[:, None]], axis=-1
        )
        nodes = Linear(self.cfg.n_map, dtype=self.dtype, name="meta")(
            jnp.concatenate([nodes, meta.astype(nodes.dtype)], axis=-1)
        )
        for i in range(self.cfg.num_att_layers):
            nodes = Att(self.cfg.n_map, self.cfg.n_actor, dtype=self.dtype,
                        pallas_edge=self.cfg.pallas_edge, name=f"att{i}")(
                nodes, graph.ctrs, actors, actor_ctrs, a2m_edges, pair
            )
        return nodes


class M2M(nn.Module):
    """Lane → lane propagation: LaneConv stack without input embedding
    (reference lanegcn.py:410-480)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, nodes: jax.Array, graph: LaneGraphBatch) -> jax.Array:
        return LaneConvStack(
            self.cfg, self.cfg.num_fuse_layers, dtype=self.dtype, name="fuse"
        )(nodes, graph.edges, graph.bands, graph.tables, graph.table_inv,
          plan=_graph_plan(graph), spill=getattr(graph, "spill_pair", None))


class M2A(nn.Module):
    """Lane-node → actor fusion (reference lanegcn.py:483-513)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        actors: jax.Array,
        actor_ctrs: jax.Array,
        nodes: jax.Array,
        node_ctrs: jax.Array,
        m2a_edges: EdgeSet,
        pair: PairPlan | None = None,
    ) -> jax.Array:
        for i in range(self.cfg.num_att_layers):
            actors = Att(self.cfg.n_actor, self.cfg.n_map, dtype=self.dtype,
                         pallas_edge=self.cfg.pallas_edge, name=f"att{i}")(
                actors, actor_ctrs, nodes, node_ctrs, m2a_edges, pair
            )
        return actors


class A2A(nn.Module):
    """Actor ↔ actor interaction (reference lanegcn.py:516-545)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        actors: jax.Array,
        actor_ctrs: jax.Array,
        a2a_edges: EdgeSet,
        pair: PairPlan | None = None,
    ) -> jax.Array:
        for i in range(self.cfg.num_att_layers):
            actors = Att(self.cfg.n_actor, self.cfg.n_actor, dtype=self.dtype,
                         pallas_edge=self.cfg.pallas_edge, name=f"att{i}")(
                actors, actor_ctrs, actors, actor_ctrs, a2a_edges, pair
            )
        return actors
