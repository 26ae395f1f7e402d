"""Typed configuration for the framework.

The reference keeps one module-level python dict per model file
(reference lanegcn.py:28-92, lanercnn.py:30-82). Here the same knob set is
expressed as frozen dataclasses so configs are hashable (usable as jit static
args) and self-documenting.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """LaneGCN model hyper-parameters (reference lanegcn.py:74-91)."""

    n_actor: int = 128
    n_map: int = 128
    num_scales: int = 6  # pre/suc dilations 1,2,4,8,16,32
    num_mods: int = 6
    num_preds: int = 30  # 30 future steps @ 10 Hz
    num_hist: int = 20   # 20 observed steps
    actor2map_dist: float = 7.0
    map2actor_dist: float = 6.0
    actor2actor_dist: float = 100.0
    num_fuse_layers: int = 4   # residual LaneConv blocks in MapNet / M2M
    num_att_layers: int = 2    # Att repetitions per fusion stage
    pred_range: Tuple[float, float, float, float] = (-100.0, 100.0, -100.0, 100.0)
    # Banded LaneConv aggregation backend (ops/pallas_band_conv.py):
    # "auto" = fused Pallas kernel on TPU, XLA einsum elsewhere;
    # "on"/"off" force it; "interpret" runs the kernel in interpret mode
    # (CPU-testable end-to-end). The kernel is single-device — keep "off"
    # under explicit graph-axis sharding (GSPMD cannot partition it).
    pallas_bands: str = "auto"
    # Fusion-stage edge MLP backend (ops/pallas_edge_mlp.py): same mode
    # semantics. Fuses the Att/LanePooling per-edge chain (dist MLP + 3-way
    # add + GN + relu + ctx_out) into one kernel so the [E, C]
    # intermediates never round-trip HBM.
    pallas_edge: str = "auto"
    # Scenario-blocked overflow aggregation backend
    # (ops/pallas_scenario_agg.py): consumes the packer's scenario edge plan
    # (PackConfig.node_stride + max_plan_edges) and replaces the
    # gather + per-relation matmul + XLA scatter per LaneConv layer with
    # one-hot MXU matmuls per scenario. "auto" = Pallas on TPU, XLA
    # reference elsewhere; "on"/"interpret"/"off" force.
    scenario_agg: str = "auto"
    # Merge the scenario plan INTO the fused LaneConv layer kernel
    # (ops/pallas_lane_layer.fused_lane_layer_plan) when the node tile can
    # equal the window stride. A/B'd on TPU v5e (round 5): the merge saves
    # 2.5 GB/step of window round-trips but measures 1.3% SLOWER than the
    # separate kernels (130.3 vs 128.7 ms) — the layer part drops from
    # 1024-row to 768-row tiles (272 grid steps vs 204) and the in-kernel
    # plan serializes with the band matmuls, costing more than the saved
    # traffic. Default "off"; "auto" enables when geometry allows
    # (stride >= 512, plan cap a chunk multiple) — parity pinned by
    # tests/test_pallas_kernels.py::test_plan_merged_layer_matches_separate_kernels.
    merge_plan_agg: str = "off"

    @property
    def num_relations(self) -> int:
        """pre0..pre{S-1}, suc0..suc{S-1}, left, right."""
        return 2 * self.num_scales + 2


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Joint classification + regression loss (reference lanegcn.py:87-91)."""

    cls_coef: float = 1.0
    reg_coef: float = 1.0
    mgn: float = 0.2
    cls_th: float = 2.0
    cls_ignore: float = 0.2


@dataclasses.dataclass(frozen=True)
class PackConfig:
    """Static capacities for one packed batch (one device's micro-batch).

    The reference batches by python lists of variable-size tensors
    (reference data.py:555-561); XLA needs static shapes, so scenarios are
    packed into fixed-capacity buffers with validity masks. Capacities are a
    compilation key — keep the set of distinct PackConfigs small (bucketing).
    """

    max_scenarios: int = 32     # scenarios per pack (= per-device batch)
    max_actors: int = 512       # total actors across the pack
    max_nodes: int = 8192       # total lane nodes across the pack
    max_edges_scale0: int = 8192   # per-relation capacity for pre0/suc0
    # Per-relation capacity for pre_i/suc_i, i>=1: one int for all dilated
    # scales, or a tuple of length num_scales-1 (scale i uses entry i-1 —
    # dilated edge counts grow ~2^i at junction fans, so per-scale sizing
    # avoids paying the largest scale's capacity on every scale).
    max_edges_dilated: Any = 8192
    max_edges_lr: int = 4096       # capacity for left/right
    max_a2m_edges: int = 16384
    max_m2a_edges: int = 16384
    max_a2a_edges: int = 8192
    # Capacity of the combined inverse edge list backing the neighbor-table
    # backward (ops.table_gather). 0 ⇒ auto (2 × max_nodes — exact upper
    # bound for the default left/right tabling: each node has at most one
    # left and one right neighbor). On overflow the packer demotes table
    # entries to the regular edge lists, so gradients stay exact either way.
    max_table_edges: int = 0
    # WINDOWED node layout: nodes are placed window-aligned first-fit into
    # fixed node_stride-row windows (a scenario lands inside one window when
    # it fits; oversize scenarios straddle). Enables the window edge plan
    # for ops/pallas_scenario_agg. Requires max_nodes % node_stride == 0.
    # None ⇒ contiguous packing (round-1/2 layout). Density cost is the
    # alignment gaps (~4-6% rows measured on urban packs at stride 768).
    node_stride: int | None = None
    # Per-window capacity of the window edge plan (overflow edges with both
    # endpoints in one window, routed to ops/pallas_scenario_agg; cross-
    # window edges and the residue past this budget stay in the classic
    # per-relation edge lists). 0 ⇒ no plan. Requires node_stride.
    max_plan_edges: int = 0
    # Relations routed to per-node neighbor tables (pack_batch split_tables;
    # left/right are functional so tables absorb them entirely). With the
    # window plan enabled, () routes left/right through the plan instead —
    # measured faster: the table backward was a 262k-row sorted scatter per
    # layer, the plan adds only one-hot matmul columns.
    table_relations: Tuple[str, ...] = ("left", "right")
    # WINDOWED actor layout (mirrors node_stride): actors are placed
    # window-aligned first-fit into actor_stride-row windows. Required for
    # the fusion pair plans. Requires max_actors % actor_stride == 0.
    actor_stride: int | None = None
    # Emit window-pair chunked fusion-edge plans (graph.PairPlan) for the
    # fused Att kernel (ops/pallas_win_edge). Requires node_stride +
    # actor_stride. Capacities are the max_*_edges knobs rounded down to
    # pair_chunk multiples; chunk-alignment padding means the same knob
    # admits fewer edges than the flat EdgeSet (size accordingly — overflow
    # drops edges with a dropped_pair_* counter, same policy as the lists).
    fusion_pairs: bool = False
    pair_chunk: int = 128
    # Route the window plan's residue (cross-window + over-budget overflow
    # edges) into a (dst-window, src-window) chunk-pair plan for
    # ops/pallas_pair_agg instead of the classic gather/scatter edge lists.
    # Requires node_stride + max_plan_edges; capacity in slots
    # (chunk-pair alignment padding included — size to measured residue).
    spill_pairs: bool = False
    max_spill_pair_edges: int = 49152

    @property
    def table_edge_capacity(self) -> int:
        return self.max_table_edges or 2 * self.max_nodes

    def edge_capacity(self, relation: str) -> int:
        if relation in ("left", "right"):
            return self.max_edges_lr
        if relation.startswith(("pre", "suc")):
            scale = int(relation[3:])
            if scale == 0:
                return self.max_edges_scale0
            med = self.max_edges_dilated
            if isinstance(med, (tuple, list)):
                return int(med[scale - 1])
            return med
        raise ValueError(f"unknown relation {relation!r}")


@dataclasses.dataclass(frozen=True)
class RoiPackConfig:
    """Static capacities for a LaneRCNN RoI pack (reference batch_size=10,
    lanercnn.py:49; each scenario contributes one RoI per moving agent)."""

    max_scenarios: int = 10
    max_rois: int = 128          # RoIs (valid agents) across the pack
    max_roi_nodes: int = 12288   # Σ RoI subgraph nodes
    max_interest_nodes: int = 2048  # Σ nodes of interest RoIs (decode)
    # Shared global lane graph capacity; 0 ⇒ max_roi_nodes (always enough —
    # every global node appears in ≥0 RoIs — but typically ~2x oversized:
    # the global graph is the union, RoI nodes are per-agent copies).
    max_global_nodes: int = 0
    max_edges_scale0: int = 16384
    max_edges_dilated: int = 20480
    max_edges_lr: int = 16384
    max_a2m_edges: int = 4096    # agent → RoI-node (≤5 m)
    max_pool_edges: int = 131072  # RoI-node ↔ global-node (≤6 m; ~10 per node)
    max_a2r_edges: int = 8192    # traj-point → interest-node (≤6 m)
    # Inverse-edge capacity for the RoI subgraphs' left/right neighbor
    # tables (ops.table_gather). 0 ⇒ 2 × max_roi_nodes (exact bound).
    max_table_edges: int = 0
    # WINDOWED layouts + window edge plan for ops/pallas_scenario_agg, as in
    # PackConfig: applies to BOTH the RoI-node space (scenario RoI blocks
    # placed first-fit into stride windows) and the shared global lane
    # graph (forwarded to its pack_batch). Requires max_roi_nodes and
    # max_global_nodes to be multiples of node_stride.
    node_stride: int | None = None
    max_plan_edges: int = 0
    # Stride for the global-graph window layout (defaults to node_stride).
    # The two spaces want different strides: RoIs are ~70-150 nodes (256
    # packs densely at RoI granularity), scenarios' global graphs ~700
    # (768 keeps them single-window).
    global_node_stride: int | None = None
    global_plan_edges: int = 0
    table_relations: Tuple[str, ...] = ("left", "right")
    # Chunk-align the pool edges (r2g/g2r) per destination window so the
    # LanePooling scatter runs via ops/pallas_window_scatter (one-hot MXU
    # matmuls). Alignment padding costs up to chunk-1 slots per occupied
    # destination window, so a max_pool_edges that fit the flat layout can
    # overflow here — the packer warns loudly when that drops edges; set
    # False to keep the flat destination-sorted layout. Only takes effect
    # with windowed layouts (node_stride set, capacity chunk-divisible).
    window_pool_edges: bool = True

    @property
    def g_stride(self):
        return self.global_node_stride or self.node_stride

    @property
    def g_plan_edges(self) -> int:
        return self.global_plan_edges or self.max_plan_edges

    @property
    def table_edge_capacity(self) -> int:
        return self.max_table_edges or 2 * self.max_roi_nodes

    def edge_capacity(self, relation: str) -> int:
        if relation in ("left", "right"):
            return self.max_edges_lr
        if relation.startswith(("pre", "suc")):
            scale = int(relation[3:])
            return self.max_edges_scale0 if scale == 0 else self.max_edges_dilated
        raise ValueError(f"unknown relation {relation!r}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training recipe (reference lanegcn.py:29-53, utils.py:98-177)."""

    opt: str = "adam"
    lr: Tuple[float, ...] = (1e-3, 1e-4)
    lr_epochs: Tuple[float, ...] = (32.0,)
    num_epochs: int = 36
    batch_size: int = 32          # scenarios per process
    weight_decay: float = 0.0
    clip_grads: bool = False
    clip_low: float = -1.0
    clip_high: float = 1.0
    save_freq: float = 1.0
    display_iters: int = 205942
    val_iters: int = 411884
    seed: int = 0
    # (param-path-prefix, coef) per-group lr scaling rules; first match wins,
    # unmatched params get 1.0 (reference Optimizer coef, utils.py:99-147).
    lr_coef: Tuple[Tuple[str, float], ...] = ()
    # Skip the optimizer update (params + moments bitwise unchanged) when the
    # loss or any gradient is non-finite. Failure detection the reference
    # lacks; a scalar select in the step, no host sync.
    nan_guard: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    pack: PackConfig = PackConfig()
    roi_pack: RoiPackConfig = RoiPackConfig()
    train: TrainConfig = TrainConfig()


def relation_names(num_scales: int = 6) -> Tuple[str, ...]:
    """Edge-relation ordering used throughout: pre0..preS, suc0..sucS, left, right."""
    names = []
    for i in range(num_scales):
        names.append(f"pre{i}")
    for i in range(num_scales):
        names.append(f"suc{i}")
    names.extend(["left", "right"])
    return tuple(names)


def band_shift(name: str) -> int | None:
    """Packed-index stride of a relation's intra-lane band, or None.

    Lanes are contiguous node runs in pack order, so the intra-lane part of
    pre/suc at dilation 2^s is exactly v = u ∓ 2^s (pre points backward).
    left/right have no band structure.
    """
    if name.startswith("pre"):
        return -(1 << int(name[3:]))
    if name.startswith("suc"):
        return 1 << int(name[3:])
    return None
