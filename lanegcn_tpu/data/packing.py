"""Pack variable-size scenarios into static-shape PackedBatch pytrees.

Replaces the reference's on-GPU actor_gather/graph_gather merge
(reference lanegcn.py:155-209) and the on-the-fly fusion-edge construction
inside Att (lanegcn.py:672-689): everything dynamic is resolved here on host,
with pack-global indices baked into fixed-capacity buffers.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from lanegcn_tpu.config import ModelConfig, PackConfig, band_shift, relation_names
from lanegcn_tpu.graph import ActorBatch, EdgeSet, FusionEdges, LaneGraphBatch, PackedBatch


def _pad_edges(u: np.ndarray, v: np.ndarray, capacity: int) -> Tuple[EdgeSet, int]:
    """Pad (or truncate, counting drops) an edge list to capacity."""
    n = len(u)
    dropped = max(0, n - capacity)
    n = min(n, capacity)
    uu = np.zeros(capacity, np.int32)
    vv = np.zeros(capacity, np.int32)
    mm = np.zeros(capacity, bool)
    uu[:n], vv[:n], mm[:n] = u[:n], v[:n], True
    return EdgeSet(u=uu, v=vv, mask=mm), dropped


def _threshold_edges(
    dst_ctrs: np.ndarray, src_ctrs: np.ndarray, th: float
) -> Tuple[np.ndarray, np.ndarray]:
    """All (i, j) with ||dst[i] - src[j]|| <= th (reference lanegcn.py:676-687)."""
    if len(dst_ctrs) == 0 or len(src_ctrs) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    from lanegcn_tpu import native

    res = native.threshold_edges(dst_ctrs, src_ctrs, th)
    if res is not None:
        return res[0].astype(np.int64), res[1].astype(np.int64)
    d = dst_ctrs[:, None, :] - src_ctrs[None, :, :]
    dist = np.sqrt((d ** 2).sum(2))
    return np.nonzero(dist <= th)[:2]


def pack_batch(
    scenarios: Sequence[Dict],
    pack_cfg: PackConfig,
    model_cfg: ModelConfig,
    split_bands: bool = True,
) -> Tuple[PackedBatch, Dict[str, int]]:
    """Pack up to pack_cfg.max_scenarios scenarios; returns (batch, stats).

    Scenarios that would overflow actor/node capacity are skipped (counted in
    stats["skipped_scenarios"]); overflowing edge lists are truncated with
    per-relation drop counts.

    split_bands: route each pre/suc relation's intra-lane edges
    (v = u + band_shift(nm); lanes are contiguous node runs, offsets
    preserved by packing) into a per-node [N] bool band mask instead of the
    edge list. The model applies bands as a masked roll — no gather/scatter —
    and the edge lists keep only the irregular (cross-lane) remainder.
    """
    names = relation_names(model_cfg.num_scales)
    b_cap = pack_cfg.max_scenarios
    a_cap, n_cap = pack_cfg.max_actors, pack_cfg.max_nodes
    t_hist, t_pred = model_cfg.num_hist, model_cfg.num_preds

    actor_feats = np.zeros((a_cap, t_hist, 3), np.float32)
    actor_ctrs = np.zeros((a_cap, 2), np.float32)
    actor_mask = np.zeros(a_cap, bool)
    actor_scen = np.zeros(a_cap, np.int32)
    gt_preds = np.zeros((a_cap, t_pred, 2), np.float32)
    has_preds = np.zeros((a_cap, t_pred), bool)

    node_ctrs = np.zeros((n_cap, 2), np.float32)
    node_feats = np.zeros((n_cap, 2), np.float32)
    node_turn = np.zeros((n_cap, 2), np.float32)
    node_control = np.zeros(n_cap, np.float32)
    node_intersect = np.zeros(n_cap, np.float32)
    node_mask = np.zeros(n_cap, bool)
    node_scen = np.zeros(n_cap, np.int32)

    rot = np.tile(np.eye(2, dtype=np.float32), (b_cap, 1, 1))
    orig = np.zeros((b_cap, 2), np.float32)
    scen_mask = np.zeros(b_cap, bool)
    agent_idx = np.zeros(b_cap, np.int32)

    rel_edges: Dict[str, List[np.ndarray]] = {nm: [[], []] for nm in names}
    a2m_u, a2m_v = [], []
    m2a_u, m2a_v = [], []
    a2a_u, a2a_v = [], []

    stats = {"skipped_scenarios": 0, "packed_scenarios": 0}
    a_off = 0
    n_off = 0
    si = 0
    for scen in scenarios:
        if si >= b_cap:
            stats["skipped_scenarios"] += 1
            continue
        na = len(scen["feats"])
        nn = int(scen["graph"]["num_nodes"])
        if na == 0 or a_off + na > a_cap or n_off + nn > n_cap:
            stats["skipped_scenarios"] += 1
            continue

        actor_feats[a_off : a_off + na] = scen["feats"]
        actor_ctrs[a_off : a_off + na] = scen["ctrs"]
        actor_mask[a_off : a_off + na] = True
        actor_scen[a_off : a_off + na] = si
        gt_preds[a_off : a_off + na] = scen["gt_preds"]
        has_preds[a_off : a_off + na] = scen["has_preds"]

        g = scen["graph"]
        node_ctrs[n_off : n_off + nn] = g["ctrs"]
        node_feats[n_off : n_off + nn] = g["feats"]
        node_turn[n_off : n_off + nn] = g["turn"]
        node_control[n_off : n_off + nn] = g["control"]
        node_intersect[n_off : n_off + nn] = g["intersect"]
        node_mask[n_off : n_off + nn] = True
        node_scen[n_off : n_off + nn] = si

        for s in range(model_cfg.num_scales):
            for kind in ("pre", "suc"):
                nm = f"{kind}{s}"
                e = g[kind][s]
                rel_edges[nm][0].append(np.asarray(e["u"], np.int64) + n_off)
                rel_edges[nm][1].append(np.asarray(e["v"], np.int64) + n_off)
        for nm in ("left", "right"):
            e = g[nm]
            rel_edges[nm][0].append(np.asarray(e["u"], np.int64) + n_off)
            rel_edges[nm][1].append(np.asarray(e["v"], np.int64) + n_off)

        # Fusion edges (centers are agent-frame constants → exact thresholds).
        ui, vi = _threshold_edges(g["ctrs"], scen["ctrs"], model_cfg.actor2map_dist)
        a2m_u.append(ui + n_off)
        a2m_v.append(vi + a_off)
        ui, vi = _threshold_edges(scen["ctrs"], g["ctrs"], model_cfg.map2actor_dist)
        m2a_u.append(ui + a_off)
        m2a_v.append(vi + n_off)
        ui, vi = _threshold_edges(scen["ctrs"], scen["ctrs"], model_cfg.actor2actor_dist)
        a2a_u.append(ui + a_off)
        a2a_v.append(vi + a_off)

        rot[si] = scen["rot"]
        orig[si] = scen["orig"]
        scen_mask[si] = True
        agent_idx[si] = a_off  # AGENT is actor 0 of its scenario
        a_off += na
        n_off += nn
        si += 1
    stats["packed_scenarios"] = si
    stats["num_actors"] = a_off
    stats["num_nodes"] = n_off

    edges = {}
    bands = {} if split_bands else None
    for nm in names:
        u = np.concatenate(rel_edges[nm][0]) if rel_edges[nm][0] else np.zeros(0, np.int64)
        v = np.concatenate(rel_edges[nm][1]) if rel_edges[nm][1] else np.zeros(0, np.int64)
        shift = band_shift(nm) if split_bands else None
        if shift is not None:
            # At most one edge per (u, shift) pair exists (dilated adjacency
            # is deduplicated), so a bool mask over u is an exact encoding.
            banded = (v - u) == shift
            mask = np.zeros(n_cap, bool)
            mask[u[banded]] = True
            bands[nm] = mask
            stats[f"banded_{nm}"] = int(banded.sum())
            u, v = u[~banded], v[~banded]
        edges[nm], dropped = _pad_edges(u, v, pack_cfg.edge_capacity(nm))
        stats[f"dropped_{nm}"] = dropped

    def _fuse(us, vs, cap, name):
        u = np.concatenate(us) if us else np.zeros(0, np.int64)
        v = np.concatenate(vs) if vs else np.zeros(0, np.int64)
        es, dropped = _pad_edges(u, v, cap)
        stats[f"dropped_{name}"] = dropped
        return es

    fusion = FusionEdges(
        a2m=_fuse(a2m_u, a2m_v, pack_cfg.max_a2m_edges, "a2m"),
        m2a=_fuse(m2a_u, m2a_v, pack_cfg.max_m2a_edges, "m2a"),
        a2a=_fuse(a2a_u, a2a_v, pack_cfg.max_a2a_edges, "a2a"),
    )

    batch = PackedBatch(
        actors=ActorBatch(feats=actor_feats, ctrs=actor_ctrs, mask=actor_mask, scen=actor_scen),
        graph=LaneGraphBatch(
            ctrs=node_ctrs,
            feats=node_feats,
            turn=node_turn,
            control=node_control,
            intersect=node_intersect,
            node_mask=node_mask,
            node_scen=node_scen,
            edges=edges,
            bands=bands,
        ),
        fusion=fusion,
        gt_preds=gt_preds,
        has_preds=has_preds,
        rot=rot,
        orig=orig,
        scen_mask=scen_mask,
        agent_idx=agent_idx,
    )
    return batch, stats
