"""MapNet + the LaneConv stack (reference lanegcn.py:266-363, 410-480).

The LaneConv residual block computes, per node u:

    temp[u] = W_ctr x[u] + Σ_{r ∈ pre0..5, suc0..5, left, right}
                Σ_{(u,v) ∈ E_r} W_r x[v]
    x' = ReLU(GN(temp));  x'' = ReLU(Linear(x') + res)

The reference runs one `index_add_` CUDA scatter per relation per layer
(lanegcn.py:329-362). TPU-first formulation: the regular majority of each
relation (intra-lane bands: v = u + 2^s in pack order; neighbor tables: the
first edge per destination — ALL of left/right, which are functional nearest
matches) is carried in node-aligned [N] structures and aggregated by one
relation-and-channel-contracting einsum (one big MXU matmul); only the
duplicate-destination overflow goes through masked gather + ONE combined
deterministic scatter-add over static-capacity edge lists.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanegcn_tpu.config import ModelConfig, band_shift, relation_names
from lanegcn_tpu.graph import EdgeSet, LaneGraphBatch
from lanegcn_tpu.models.layers import Dense, GroupNorm, Linear, torch_uniform_init
from lanegcn_tpu.ops import masked_gather, scatter_add
from lanegcn_tpu.ops.pallas_lane_layer import fused_lane_layer
from lanegcn_tpu.ops.pallas_pair_agg import pair_aggregate
from lanegcn_tpu.ops.pallas_scenario_agg import scenario_aggregate
from lanegcn_tpu.ops.table_gather import stacked_table_gather



def _graph_plan(graph):
    """(lu, lv, rel, num_scen) when the pack carries a scenario edge plan."""
    if getattr(graph, "plan_lu", None) is None:
        return None
    return (graph.plan_lu, graph.plan_lv, graph.plan_rel, graph.plan_scen)


class LaneConvStack(nn.Module):
    """num_layers residual LaneConv blocks; shared by MapNet, M2M, and the
    LaneRCNN RoI/global-graph encoders (same 14-relation kernel)."""

    cfg: ModelConfig
    num_layers: int = 4
    dtype: Any = jnp.float32

    def _use_pallas_bands(self) -> bool:
        mode = self.cfg.pallas_bands
        if mode == "auto":
            # "axon" is a TPU reached through a relay; same Mosaic target.
            return jax.default_backend() in ("tpu", "axon")
        return mode in ("on", "interpret")

    def _scen_agg_mode(self) -> str:
        """Backend for the scenario edge plan (ops/pallas_scenario_agg):
        "on"/"interpret" = Pallas kernel, "xla" = reference formulation.
        Planned edges are always aggregated — "off" only disables the
        Pallas kernel, it cannot drop edges."""
        mode = self.cfg.scenario_agg
        if mode == "auto":
            return "on" if jax.default_backend() in ("tpu", "axon") else "xla"
        if mode in ("on", "interpret"):
            return mode
        return "xla"

    @nn.compact
    def __call__(
        self,
        feat: jax.Array,
        edges: Dict[str, EdgeSet],
        bands: Dict[str, jax.Array] | None = None,
        tables: Dict[str, jax.Array] | None = None,
        table_inv: EdgeSet | None = None,
        plan: tuple | None = None,  # (lu, lv, rel, num_scen) scenario plan
        spill=None,  # graph.PairPlan: cross-window residue (pallas_pair_agg)
    ) -> jax.Array:
        """bands: optional per-relation [N] bool masks of intra-lane edges
        (v = u + band_shift(nm)); applied as a masked roll — one vector op
        replacing the gather + scatter-add for the regular majority of
        pre/suc edges (see data/packing.py split_bands).

        tables: optional per-relation [N] int32 neighbor tables (value =
        source row, or ≥ N ⇒ none); applied as one stacked dense row gather —
        the first edge per destination (ALL of left/right, which are
        functional by construction) costs no scatter (split_tables).
        table_inv: the packer's combined inverse edge list; required with
        tables — it makes the gather's backward one sorted scatter instead
        of one scatter per relation (ops.table_gather)."""
        n_map = self.cfg.n_map
        names = relation_names(self.cfg.num_scales)
        num_nodes = feat.shape[0]

        res = feat
        for i in range(self.num_layers):
            temp = Dense(n_map, use_bias=False, dtype=self.dtype, name=f"ctr_{i}")(feat)
            # One stacked weight for all relations: [R, C, C].
            w_rel = self.param(
                f"rel_kernel_{i}",
                torch_uniform_init(n_map),
                (len(names), n_map, n_map),
            )
            # Regular relation slices, contracted in ONE einsum over relation
            # and channel — temp[u] += Σ_r slice_r[u] @ W_r, where slice_r is
            # the masked roll of the intra-lane band (v = u + 2^s in pack
            # order) for pre/suc, or the neighbor-table gather for
            # left/right.
            band_rel = [
                (r, name) for r, name in enumerate(names)
                if bands is not None and name in bands
            ]
            tbl_rel = [
                (r, name) for r, name in enumerate(names)
                if tables is not None and name in tables
            ]
            # Band relations carry their residue in edge lists, not tables
            # (packing.py table_relations) — the slice stack below relies on
            # each relation appearing at most once.
            assert not (
                {r for r, _ in band_rel} & {r for r, _ in tbl_rel}
            ), "a relation cannot be both banded and tabled"
            fused = bool(band_rel) and self._use_pallas_bands()
            rows, w_order = [], []
            if not fused:
                for r, name in band_rel:
                    rows.append(
                        jnp.where(
                            bands[name][:, None],
                            jnp.roll(feat, -band_shift(name), axis=0),
                            0,
                        ).astype(self.dtype)
                    )
                    w_order.append(r)
            if tbl_rel:
                # Tabled relations (left/right): one stacked row gather whose
                # backward is one sorted transpose scatter (ops.table_gather)
                # instead of one scatter per relation.
                assert table_inv is not None, "tables require table_inv (packer emits both)"
                tbl_stack = jnp.stack([tables[name] for _, name in tbl_rel], 0)
                xg = stacked_table_gather(
                    feat, tbl_stack, table_inv.u, table_inv.v
                ).astype(self.dtype)
                rows.append(xg.reshape(-1, feat.shape[-1]))
                w_order.extend(r for r, _ in tbl_rel)
            if rows:
                xs = jnp.concatenate(rows, 0).reshape(
                    len(w_order), num_nodes, feat.shape[-1]
                )
                wb = w_rel[jnp.asarray(w_order)]
                temp = temp + jnp.einsum(
                    "rnc,rcd->nd",
                    xs,
                    wb.astype(self.dtype),
                    preferred_element_type=self.dtype,
                )
            # Irregular overflow edges (duplicate-destination residue; the
            # whole relation when bands/tables are off): gather source rows,
            # per-relation matmul on static slices, then ONE deterministic
            # scatter-add of the concatenated messages — a single
            # read-modify-write of the [N, C] output instead of one per
            # relation (measured 2.1x at production sizes).
            msgs, dsts, msks = [], [], []
            for r, name in enumerate(names):
                e = edges[name]
                src = masked_gather(feat, e.v, e.mask)
                msgs.append(
                    jnp.matmul(
                        src.astype(self.dtype),
                        w_rel[r].astype(self.dtype),
                        preferred_element_type=self.dtype,
                    )
                )
                dsts.append(e.u)
                msks.append(e.mask)
            temp = scatter_add(
                jnp.concatenate(msgs),
                jnp.concatenate(dsts),
                num_nodes,
                mask=jnp.concatenate(msks),
                out=temp,
            )
            plan_groups = None
            merge_plan = False
            if plan is not None:
                lu, lv, rel_ids, num_scen = plan
                # Relation groups match build_window_plan's chunk-aligned
                # layout: left/right chunks run 2 relation matmuls instead
                # of 14 (~50% of plan edges on urban packs). Plans below
                # GROUPED_MIN_CAP are built single-group (same constant on
                # the packer side).
                from lanegcn_tpu.ops.pallas_scenario_agg import (
                    _CHUNK as PLAN_CHUNK,
                    GROUPED_MIN_CAP,
                )

                ecap = lu.shape[0] // num_scen
                lr = tuple(r for r, nm in enumerate(names)
                           if nm in ("left", "right"))
                dil = tuple(r for r, nm in enumerate(names)
                            if nm not in ("left", "right"))
                if ecap >= GROUPED_MIN_CAP and lr and dil:
                    plan_groups = (lr, dil)
                # Plan merged into the layer kernel when the node tile can
                # equal the window stride (ops/pallas_lane_layer
                # fused_lane_layer_plan): one less kernel family per layer,
                # no separate feat/temp/out window round-trips.
                stride_w = num_nodes // num_scen
                merge_plan = (
                    fused
                    and self.cfg.merge_plan_agg != "off"
                    and self._scen_agg_mode() != "xla"
                    and num_nodes % num_scen == 0
                    and stride_w % 128 == 0
                    and stride_w >= 512
                    and ecap % PLAN_CHUNK == 0
                )
            if plan is not None and not merge_plan:
                # Scenario edge plan as its own kernel: the bulk of the
                # overflow edges as one-hot MXU matmuls per scenario (the
                # lists above carry only the spill residue).
                temp = scenario_aggregate(
                    feat.astype(self.dtype),
                    temp,
                    w_rel.astype(self.dtype),
                    lu, lv, rel_ids, num_scen,
                    mode=self._scen_agg_mode(),
                    groups=plan_groups,
                )
            if spill is not None:
                # Cross-window / over-budget residue as (dst-window,
                # src-window) chunk pairs (ops/pallas_pair_agg) — the
                # classic lists above then hold only the pair-capacity
                # overflow (normally empty).
                temp = pair_aggregate(
                    feat.astype(self.dtype),
                    temp,
                    w_rel.astype(self.dtype),
                    spill,
                    mode=self._scen_agg_mode(),
                )

            if fused:
                # Fully-fused layer: the 12 band matmuls + GN → ReLU →
                # Linear → GN → residual → ReLU run in one Pallas kernel
                # (ops/pallas_lane_layer.py); `temp` carries the irregular
                # part computed above. The shadow modules declare exactly
                # the parameters the unfused path would (same tree → same
                # init, checkpoint-compatible either way).
                shifts = tuple(band_shift(name) for _, name in band_rel)
                band_masks = jnp.stack(
                    [bands[name] for _, name in band_rel], 0
                ).astype(self.dtype)
                wb_band = w_rel[jnp.asarray([r for r, _ in band_rel])]
                g1w, g1b = _GroupNormParams(name=f"norm_{i}")(n_map)
                k2, g2w, g2b = _LinearParams(n_map, name=f"ctr2_{i}")(n_map)
                if merge_plan:
                    from lanegcn_tpu.ops.pallas_lane_layer import (
                        fused_lane_layer_plan,
                    )

                    feat = fused_lane_layer_plan(
                        feat.astype(self.dtype),
                        temp.astype(self.dtype),
                        band_masks,
                        wb_band.astype(self.dtype),
                        k2.astype(self.dtype),
                        g1w, g1b, g2w, g2b,
                        w_rel.astype(self.dtype),
                        lu, lv, rel_ids,
                        int(num_scen),
                        shifts,
                        plan_groups,
                        1e-5,
                        self.cfg.pallas_bands == "interpret",
                    )
                else:
                    feat = fused_lane_layer(
                        feat.astype(self.dtype),
                        temp.astype(self.dtype),
                        band_masks,
                        wb_band.astype(self.dtype),
                        k2.astype(self.dtype),
                        g1w, g1b, g2w, g2b,
                        shifts,
                        1e-5,
                        self.cfg.pallas_bands == "interpret",
                    )
            else:
                feat = nn.relu(GroupNorm(name=f"norm_{i}")(temp))
                feat = Linear(n_map, act=False, dtype=self.dtype, name=f"ctr2_{i}")(feat)
                feat = nn.relu(feat + res)
            res = feat
        return feat


class _GroupNormParams(nn.Module):
    """Declares GroupNorm's parameters (same names/shapes/inits as
    models.layers.GroupNorm) without computing — the fused Pallas layer
    consumes the raw values while keeping the parameter tree identical to
    the unfused path."""

    @nn.compact
    def __call__(self, c: int):
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return w, b


class _DenseParams(nn.Module):
    """Parameter shadow of models.layers.Dense(use_bias=False)."""

    n_in: int
    n_out: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_uniform_init(self.n_in), (self.n_in, self.n_out))


class _LinearParams(nn.Module):
    """Parameter shadow of models.layers.Linear (Dense 'linear' + GN 'norm')."""

    n_out: int

    @nn.compact
    def __call__(self, n_in: int):
        k = _DenseParams(n_in, self.n_out, name="linear")()
        w, b = _GroupNormParams(name="norm")(self.n_out)
        return k, w, b


class MapNet(nn.Module):
    """Lane-node embedding + LaneConv stack (reference lanegcn.py:266-363)."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, graph: LaneGraphBatch) -> jax.Array:
        """graph → [N, n_map] node features."""
        n_map = self.cfg.n_map
        # input MLP on node centers; seg MLP on segment direction vectors.
        ctr_emb = Dense(n_map, dtype=self.dtype, name="input_dense")(graph.ctrs)
        ctr_emb = Linear(n_map, act=False, dtype=self.dtype, name="input_out")(nn.relu(ctr_emb))
        seg_emb = Dense(n_map, dtype=self.dtype, name="seg_dense")(graph.feats)
        seg_emb = Linear(n_map, act=False, dtype=self.dtype, name="seg_out")(nn.relu(seg_emb))
        feat = nn.relu(ctr_emb + seg_emb)

        return LaneConvStack(
            self.cfg, self.cfg.num_fuse_layers, dtype=self.dtype, name="fuse"
        )(feat, graph.edges, graph.bands, graph.tables, graph.table_inv,
          plan=_graph_plan(graph), spill=getattr(graph, "spill_pair", None))
