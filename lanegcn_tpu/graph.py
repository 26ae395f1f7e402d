"""Static-shape batch pytrees: the framework's core data layout.

The reference batches scenarios as python lists of variable-size tensors and
merges them on-GPU per forward pass (reference lanegcn.py:155-209,
data.py:555-561). That defeats XLA. Here a batch is *packed* on host into
fixed-capacity, mask-carrying arrays:

- all actors of all scenarios concatenated into one [A, ...] buffer,
- all lane nodes into one [N, ...] buffer,
- every edge relation (pre/suc at 6 dilations, left, right — reference
  data.py:272-361) into its own fixed-capacity [E] (u, v, mask) triple with
  pack-global node indices baked in,
- the distance-gated fusion edges (a2m/m2a/a2a, reference lanegcn.py:672-689)
  precomputed on host into the same format (centers are data-time constants,
  so thresholding on host is exact, not an approximation).

Every array's capacity comes from config.PackConfig, so one jit compilation
serves every batch of a bucket.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EdgeSet:
    """Fixed-capacity directed edge list: messages flow v (source) → u (dest).

    When the packer emits the list destination-sorted (u non-decreasing over
    valid edges), it also attaches the source-side inverse: inv_perm is the
    argsort of v (valid edges first), inv_dst = v[inv_perm] non-decreasing
    with the source-row count as padding sentinel. Consumers then run the
    forward scatter-add with indices_are_sorted and lower the VJP of the
    source gather to one permute + one sorted scatter instead of XLA's
    unsorted scatter (ops.table_gather.sorted_transpose_gather)."""

    u: jax.Array  # [E] int32, destination row index
    v: jax.Array  # [E] int32, source row index
    mask: jax.Array  # [E] bool, False on padding
    inv_perm: jax.Array | None = None  # [E] int32 argsort of v, or None
    inv_dst: jax.Array | None = None  # [E] int32 sorted v (+ sentinel), or None
    # Window-chunked layout (data/packing.py window_chunked_edges): when the
    # destination array is windowed (node_stride layouts), the packer can
    # additionally align each destination window's edge segment to
    # 512-edge chunks so consumers scatter via the one-hot MXU kernel
    # (ops/pallas_window_scatter) instead of XLA's serial-row scatter.
    win_lu: jax.Array | None = None  # [E, 1] int32 window-local dst (-1 pad)
    win_chunk: jax.Array | None = None  # [E/512] int32 dst window per chunk
    win_first: jax.Array | None = None  # [E/512] int32 first-of-window flag
    win_stride: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.u.shape[0]

    @property
    def dst_sorted(self) -> bool:
        """True iff u (with mask-sentinel substitution) is non-decreasing —
        the contract scatter_add(indices_are_sorted=...) relies on. Window-
        chunked layouts intersperse padding holes mid-array (their sentinel
        substitution is NOT sorted), so they are excluded; consumers reach
        them through win_lu / the one-hot window kernel instead."""
        return self.inv_perm is not None and self.win_lu is None

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))


@struct.dataclass
class PairPlan:
    """Window-pair chunked edge layout for ops/pallas_win_edge.

    Edges are grouped by (destination window, source window) pair and laid
    out in chunk-aligned slots (data/packing.py build_pair_plan). Chunks are
    sorted by (dwin, swin) so destination-window runs are contiguous (the
    kernel accumulates into a VMEM-resident destination block across its
    consecutive chunks); `sperm` re-orders the same chunks by (swin, dwin)
    for the backward's source-side pass. NC = capacity // chunk.
    """

    # Two consolidated leaves (the axon relay pays high per-array transfer
    # latency, so the plan ships as 2 arrays instead of 8):
    # idx[:, 0] = window-local dst row, idx[:, 1] = window-local src row
    # (-1 padding); optional idx[:, 2] = relation id (LaneConv spill
    # plans); meta rows = dwin, swin, first, sperm, sswin, sfirst.
    idx: jax.Array  # [NC*chunk, 2 or 3] int32
    meta: jax.Array  # [6, NC] int32
    chunk: int = struct.field(pytree_node=False, default=128)
    dst_stride: int = struct.field(pytree_node=False, default=0)
    src_stride: int = struct.field(pytree_node=False, default=0)

    @property
    def lu(self) -> jax.Array:
        return self.idx[:, 0:1]

    @property
    def lv(self) -> jax.Array:
        return self.idx[:, 1:2]

    @property
    def rel(self) -> jax.Array:
        return self.idx[:, 2:3]

    @property
    def dwin(self) -> jax.Array:
        return self.meta[0]

    @property
    def swin(self) -> jax.Array:
        return self.meta[1]

    @property
    def first(self) -> jax.Array:
        return self.meta[2]

    @property
    def sperm(self) -> jax.Array:
        return self.meta[3]

    @property
    def sswin(self) -> jax.Array:
        return self.meta[4]

    @property
    def sfirst(self) -> jax.Array:
        return self.meta[5]

    @property
    def num_chunks(self) -> int:
        return self.meta.shape[1]

    def num_valid(self) -> jax.Array:
        return jnp.sum((self.idx[:, 0] >= 0).astype(jnp.int32))


@struct.dataclass
class ActorBatch:
    """All actors of a pack, concatenated (reference actor_gather lanegcn.py:155)."""

    feats: jax.Array  # [A, T_hist, 3] (dx, dy, valid) agent-frame motion deltas
    ctrs: jax.Array  # [A, 2] last observed position (agent frame)
    mask: jax.Array  # [A] bool, False on padding
    scen: jax.Array  # [A] int32, scenario id within the pack

    @property
    def capacity(self) -> int:
        return self.feats.shape[0]


@struct.dataclass
class LaneGraphBatch:
    """All lane nodes + relation edges of a pack (reference graph_gather lanegcn.py:171)."""

    ctrs: jax.Array  # [N, 2] segment midpoints
    feats: jax.Array  # [N, 2] segment direction vectors
    turn: jax.Array  # [N, 2] one-hot (left, right)
    control: jax.Array  # [N] traffic-control flag
    intersect: jax.Array  # [N] intersection flag
    node_mask: jax.Array  # [N] bool
    node_scen: jax.Array  # [N] int32
    edges: Dict[str, EdgeSet]  # relation name (config.relation_names) → edges
    # Banded intra-lane edges, split out of `edges` by the packer: per pre/suc
    # relation, bands[nm][u] ⇔ edge (u, u + config.band_shift(nm)) exists.
    # Consumed as a masked jnp.roll instead of gather/scatter-add; None when
    # the pack was built without band splitting.
    bands: Dict[str, jax.Array] | None = None
    # Per-relation neighbor tables, split out of `edges` by the packer for
    # the relations in pack_batch's table_relations (default left/right):
    # tables[nm][u] = source row v of the FIRST edge (u, v) of that relation,
    # or the node capacity N (out of range ⇒ masked) when u has none.
    # left/right are functional — nearest-neighbor matches with exactly one
    # source per destination (reference preprocess_data.py:332-334 argmin) —
    # so the table absorbs them entirely and the aggregation becomes a dense
    # row-aligned gather (no scatter); only duplicate-destination overflow
    # stays in `edges`. None when the pack was built without table splitting.
    tables: Dict[str, jax.Array] | None = None
    # Inverse of `tables` for the backward pass (ops.table_gather): one
    # combined edge list over all relations, u = flat cotangent row
    # (relation_index * N + destination), v = the tabled source row, sorted
    # by v so the transpose scatter-add runs with indices_are_sorted. Built
    # by the packer together with `tables`; padding rows carry v = N (drop).
    table_inv: EdgeSet | None = None
    # Cross-window / over-budget residue of the window plan as a
    # (dst-window, src-window) chunk-pair plan for ops/pallas_pair_agg
    # (PackConfig.spill_pairs; idx carries the relation column). None ⇒
    # the residue stays in `edges`.
    spill_pair: "PairPlan | None" = None
    # Scenario edge plan (ops/pallas_scenario_agg): with the packer's
    # STRIDED node layout (PackConfig.node_stride), the overflow edges are
    # re-expressed per scenario in local coordinates — plan_lu/plan_lv are
    # [S*ECAP, 1] int32 scenario-local destination/source rows (-1 padding)
    # and plan_rel the relation id. The model aggregates them with one-hot
    # MXU matmuls per scenario instead of gather + XLA scatter; edges past a
    # scenario's ECAP budget stay in `edges`. None ⇒ no plan.
    plan_lu: jax.Array | None = None
    plan_lv: jax.Array | None = None
    plan_rel: jax.Array | None = None
    # Static scenario count of the plan (= PackConfig.max_scenarios); aux
    # metadata, not a pytree leaf — the kernel grid needs it at trace time.
    plan_scen: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.ctrs.shape[0]


@struct.dataclass
class FusionEdges:
    """Distance-thresholded bipartite edges for the fusion cycle.

    a2m: u indexes lane nodes, v indexes actors (dist ≤ actor2map_dist).
    m2a: u indexes actors, v indexes lane nodes (dist ≤ map2actor_dist).
    a2a: u, v index actors (dist ≤ actor2actor_dist; self-edges included,
         matching the reference's `dist <= th` including the diagonal).
    Edges never cross scenarios.
    """

    a2m: EdgeSet
    m2a: EdgeSet
    a2a: EdgeSet
    # Window-pair chunked layouts (PackConfig.fusion_pairs + actor_stride):
    # when present, Att aggregates via the fused window-pair kernel
    # (ops/pallas_win_edge) and the EdgeSets above serve the spill-free
    # reference/multi-chip paths.
    pair_a2m: PairPlan | None = None
    pair_m2a: PairPlan | None = None
    pair_a2a: PairPlan | None = None


@struct.dataclass
class PackedBatch:
    """One device's micro-batch: the unit the model consumes."""

    actors: ActorBatch
    graph: LaneGraphBatch
    fusion: FusionEdges
    gt_preds: jax.Array  # [A, T_pred, 2] world-frame ground-truth futures
    has_preds: jax.Array  # [A, T_pred] bool
    rot: jax.Array  # [B, 2, 2] agent→world rotation per scenario
    orig: jax.Array  # [B, 2] world-frame origin per scenario
    scen_mask: jax.Array  # [B] bool, False on padding scenarios
    agent_idx: jax.Array  # [B] int32 packed row of each scenario's AGENT actor

    @property
    def num_scenarios(self) -> int:
        return self.rot.shape[0]


@struct.dataclass
class RoiPackedBatch:
    """LaneRCNN batch: per-agent LaneRoI subgraphs flattened RoI-major
    (reference subgraph_gather lanercnn.py:122-231), the shared global lane
    graph, RoI↔graph pooling edges, and the interest-RoI decode layout.

    Shapes: M = roi-node capacity, R = RoI capacity, MI = interest-node
    capacity, B = scenario capacity, N = global-node capacity, T = history.
    """

    # RoI nodes (all RoIs of all scenarios concatenated).
    node_feats: jax.Array  # [M, 8] (ctr, dir, turn, control, intersect)
    node_mask: jax.Array  # [M] bool
    node_roi: jax.Array  # [M] int32 → RoI row
    # RoIs (one per valid agent).
    agent_feat: jax.Array  # [R, 80] flattened 20×(traj_xy, delta_xy)
    agent_vel: jax.Array  # [R]
    roi_mask: jax.Array  # [R] bool
    roi_scen: jax.Array  # [R] int32
    edges: Dict[str, EdgeSet]  # relations within [M]
    a2m: EdgeSet  # u → RoI rows [R], v → roi-node rows [M]
    # Global lane graph (same structure as LaneGCN's).
    graph: LaneGraphBatch
    r2g: EdgeSet  # u → global-node rows [N], v → roi-node rows [M]
    g2r: EdgeSet  # u → roi-node rows [M], v → global-node rows [N]
    # Interest-RoI decode layout (first valid agent per scenario).
    int_node_idx: jax.Array  # [MI] int32 → roi-node row in [M]
    int_node_scen: jax.Array  # [MI] int32 → scenario row in [B]
    int_node_mask: jax.Array  # [MI] bool
    a2r: EdgeSet  # u → interest-node rows [MI], v → traj-point rows [B*T]
    # Focal (interest) agent data per scenario, agent frame.
    agt_ctrs: jax.Array  # [B, 2]
    agt_dirs: jax.Array  # [B, 2] normalized last-step heading (0 if still)
    agt_vels: jax.Array  # [B]
    agt_trajs: jax.Array  # [B, T, 2] observed positions (agent frame)
    agt_traj_dirs: jax.Array  # [B, T, 2] per-step motion deltas
    gt_preds: jax.Array  # [B, T_pred, 2] agent-frame ground truth
    has_preds: jax.Array  # [B, T_pred] bool
    scen_mask: jax.Array  # [B] bool
    # Optional intra-lane band masks over [M] per pre/suc relation (same
    # masked-roll encoding as LaneGraphBatch.bands; see data/packing.py).
    bands: Dict[str, jax.Array] | None = None
    # Optional left/right neighbor tables over [M] + their combined inverse
    # (same encoding as LaneGraphBatch.tables/table_inv).
    tables: Dict[str, jax.Array] | None = None
    table_inv: EdgeSet | None = None
    # Window edge plan over the RoI-node space [M] (same encoding as
    # LaneGraphBatch.plan_* — see ops/pallas_scenario_agg).
    plan_lu: jax.Array | None = None
    plan_lv: jax.Array | None = None
    plan_rel: jax.Array | None = None
    plan_scen: int = struct.field(pytree_node=False, default=0)


def empty_edge_set(capacity: int) -> EdgeSet:
    return EdgeSet(
        u=jnp.zeros((capacity,), jnp.int32),
        v=jnp.zeros((capacity,), jnp.int32),
        mask=jnp.zeros((capacity,), bool),
    )
