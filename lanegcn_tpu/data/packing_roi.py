"""Pack LaneRCNN RoI scenarios into static-shape RoiPackedBatch pytrees.

Host-side equivalent of the reference's subgraph_gather + the on-GPU
LanePooling edge construction (reference lanercnn.py:122-231, 474-489):
RoIs are flattened RoI-major with pack-global node indices; the pooling
edges (RoI-node ↔ global-node ≤6 m, traj-point ↔ interest-node ≤6 m) are
precomputed exactly from data-time centers.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from lanegcn_tpu.config import ModelConfig, PackConfig, RoiPackConfig, relation_names
from lanegcn_tpu.data.packing import _pad_edges, _threshold_edges, pack_batch
from lanegcn_tpu.graph import RoiPackedBatch


def pack_roi_batch(
    scenarios: Sequence[Dict],
    roi_cfg: RoiPackConfig,
    model_cfg: ModelConfig,
    pooling_dist: float = 6.0,
    split_bands: bool = True,
) -> Tuple[RoiPackedBatch, Dict[str, int]]:
    """Scenarios must carry "subgraphs"/"valid_agent_ids" (lane_roi.py) in
    addition to the base featurization + graph.

    split_bands: as in pack_batch — RoI subgraph nodes are lane-contiguous
    runs too, so intra-lane pre/suc edges (v = u + band_shift) become [M]
    band masks and the edge lists keep only the cross-lane residue."""
    names = relation_names(model_cfg.num_scales)
    b_cap, r_cap = roi_cfg.max_scenarios, roi_cfg.max_rois
    m_cap, mi_cap = roi_cfg.max_roi_nodes, roi_cfg.max_interest_nodes
    t_hist, t_pred = model_cfg.num_hist, model_cfg.num_preds

    node_feats = np.zeros((m_cap, 8), np.float32)
    node_mask = np.zeros(m_cap, bool)
    node_roi = np.zeros(m_cap, np.int32)
    agent_feat = np.zeros((r_cap, 4 * t_hist), np.float32)
    agent_vel = np.zeros(r_cap, np.float32)
    roi_mask = np.zeros(r_cap, bool)
    roi_scen = np.zeros(r_cap, np.int32)

    int_node_idx = np.zeros(mi_cap, np.int32)
    int_node_scen = np.zeros(mi_cap, np.int32)
    int_node_mask = np.zeros(mi_cap, bool)

    agt_ctrs = np.zeros((b_cap, 2), np.float32)
    agt_dirs = np.zeros((b_cap, 2), np.float32)
    agt_vels = np.zeros(b_cap, np.float32)
    agt_trajs = np.zeros((b_cap, t_hist, 2), np.float32)
    agt_traj_dirs = np.zeros((b_cap, t_hist, 2), np.float32)
    gt_preds = np.zeros((b_cap, t_pred, 2), np.float32)
    has_preds = np.zeros((b_cap, t_pred), bool)
    scen_mask = np.zeros(b_cap, bool)

    rel: Dict[str, List] = {nm: [[], []] for nm in names}
    a2m_u, a2m_v = [], []
    pool_ru, pool_gv = [], []  # (roi node, global node) pairs within 6 m
    a2r_u, a2r_v = [], []

    # Also pack the shared global lane graph using the LaneGCN packer's graph
    # part (fusion edges unused here). Use a PackConfig sized from roi_cfg.
    gcfg = PackConfig(
        max_scenarios=b_cap,
        # Generous: the global-graph packer must accept every scenario this
        # packer accepted (its skip would desync offsets — asserted below).
        max_actors=64 * b_cap,
        max_nodes=m_cap,  # global nodes ≤ Σ roi nodes in practice
        max_edges_scale0=roi_cfg.max_edges_scale0,
        max_edges_dilated=roi_cfg.max_edges_dilated,
        max_edges_lr=roi_cfg.max_edges_lr,
        max_a2m_edges=1,
        max_m2a_edges=1,
        max_a2a_edges=1,
    )

    stats = {"skipped_scenarios": 0, "packed_scenarios": 0}
    used: List[Dict] = []
    m_off = 0
    r_off = 0
    mi_off = 0
    g_off = 0  # global node offset (mirrors pack_batch's packing order)
    si = 0
    for scen in scenarios:
        subs = scen.get("subgraphs", [])
        valid_ids = scen.get("valid_agent_ids", np.zeros(0, np.int64))
        nn_g = int(scen["graph"]["num_nodes"])
        tot_nodes = sum(s["num_nodes"] for s in subs)
        if (
            si >= b_cap
            or len(subs) == 0
            or r_off + len(subs) > r_cap
            or m_off + tot_nodes > m_cap
            or mi_off + subs[0]["num_nodes"] > mi_cap
            or g_off + nn_g > m_cap
        ):
            stats["skipped_scenarios"] += 1
            continue

        # Focal agent = first valid agent (reference lanercnn.py:148-149).
        focal = int(valid_ids[0])
        agt_ctrs[si] = scen["ctrs"][focal]
        last_dir = scen["feats"][focal, -1, :2]
        n = np.linalg.norm(last_dir)
        agt_dirs[si] = last_dir / n if n >= 1e-6 else 0.0
        agt_vels[si] = subs[0]["agent_vel"]
        agt_trajs[si] = scen["obs_trajs"][focal, :, :2]
        agt_traj_dirs[si] = scen["feats"][focal, :, :2]
        # Agent-frame gt (reference train_lanercnn.py:153-157).
        gt_world = scen["gt_preds"][focal]
        gt_preds[si] = (scen["rot"] @ (gt_world - scen["orig"][None, :]).T).T
        has_preds[si] = scen["has_preds"][focal]
        scen_mask[si] = True

        for k, sub in enumerate(subs):
            nn = sub["num_nodes"]
            node_feats[m_off : m_off + nn] = sub["feats"]
            node_mask[m_off : m_off + nn] = True
            node_roi[m_off : m_off + nn] = r_off
            agent_feat[r_off] = sub["agent_feat"]
            agent_vel[r_off] = sub["agent_vel"]
            roi_mask[r_off] = True
            roi_scen[r_off] = si

            for s in range(model_cfg.num_scales):
                for kind in ("pre", "suc"):
                    nm = f"{kind}{s}"
                    e = sub[kind][s]
                    rel[nm][0].append(np.asarray(e["u"], np.int64) + m_off)
                    rel[nm][1].append(np.asarray(e["v"], np.int64) + m_off)
            for nm in ("left", "right"):
                e = sub[nm]
                rel[nm][0].append(np.asarray(e["u"], np.int64) + m_off)
                rel[nm][1].append(np.asarray(e["v"], np.int64) + m_off)

            a2m_u.append(np.full(len(sub["a2m"]["v"]), r_off, np.int64))
            a2m_v.append(np.asarray(sub["a2m"]["v"], np.int64) + m_off)

            # RoI-node ↔ global-node pooling edges (≤ pooling_dist).
            ru, gv = _threshold_edges(
                sub["feats"][:, :2], scen["graph"]["ctrs"], pooling_dist
            )
            pool_ru.append(ru + m_off)
            pool_gv.append(gv + g_off)

            if k == 0:  # interest RoI
                idx = np.arange(nn, dtype=np.int64)
                int_node_idx[mi_off : mi_off + nn] = m_off + idx
                int_node_scen[mi_off : mi_off + nn] = si
                int_node_mask[mi_off : mi_off + nn] = True
                # traj-point → interest-node refinement edges.
                iu, tv = _threshold_edges(
                    sub["feats"][:, :2], agt_trajs[si], pooling_dist
                )
                a2r_u.append(iu + mi_off)
                a2r_v.append(tv + si * t_hist)
                mi_off += nn

            m_off += nn
            r_off += 1
        g_off += nn_g
        si += 1
        used.append(scen)

    stats["packed_scenarios"] = si
    stats["num_rois"] = r_off
    stats["num_roi_nodes"] = m_off
    stats["num_interest_nodes"] = mi_off

    graph_batch, gstats = pack_batch(used, gcfg, model_cfg)
    assert gstats["packed_scenarios"] == si, (gstats, si)
    for k, v in gstats.items():
        # Fusion edges of the global-graph packer are unused by LaneRCNN
        # (capacity 1 by construction) — don't report their drops.
        if k.startswith("dropped") and v and k[8:] not in ("a2m", "m2a", "a2a"):
            stats[f"graph_{k}"] = v

    from lanegcn_tpu.config import band_shift

    edges = {}
    bands = {} if split_bands else None
    for nm in names:
        u = np.concatenate(rel[nm][0]) if rel[nm][0] else np.zeros(0, np.int64)
        v = np.concatenate(rel[nm][1]) if rel[nm][1] else np.zeros(0, np.int64)
        shift = band_shift(nm) if split_bands else None
        if shift is not None:
            banded = (v - u) == shift
            mask = np.zeros(m_cap, bool)
            mask[u[banded]] = True
            bands[nm] = mask
            stats[f"banded_{nm}"] = int(banded.sum())
            u, v = u[~banded], v[~banded]
        edges[nm], dropped = _pad_edges(u, v, roi_cfg.edge_capacity(nm))
        stats[f"dropped_{nm}"] = dropped

    def _fuse(us, vs, cap, name):
        u = np.concatenate(us) if us else np.zeros(0, np.int64)
        v = np.concatenate(vs) if vs else np.zeros(0, np.int64)
        es, dropped = _pad_edges(u, v, cap)
        stats[f"dropped_{name}"] = dropped
        return es

    a2m = _fuse(a2m_u, a2m_v, roi_cfg.max_a2m_edges, "a2m")
    r2g = _fuse(pool_gv, pool_ru, roi_cfg.max_pool_edges, "r2g")  # dest=global
    g2r = _fuse(pool_ru, pool_gv, roi_cfg.max_pool_edges, "g2r")  # dest=roi
    a2r = _fuse(a2r_u, a2r_v, roi_cfg.max_a2r_edges, "a2r")

    batch = RoiPackedBatch(
        node_feats=node_feats,
        node_mask=node_mask,
        node_roi=node_roi,
        agent_feat=agent_feat,
        agent_vel=agent_vel,
        roi_mask=roi_mask,
        roi_scen=roi_scen,
        edges=edges,
        a2m=a2m,
        graph=graph_batch.graph,
        r2g=r2g,
        g2r=g2r,
        int_node_idx=int_node_idx,
        int_node_scen=int_node_scen,
        int_node_mask=int_node_mask,
        a2r=a2r,
        agt_ctrs=agt_ctrs,
        agt_dirs=agt_dirs,
        agt_vels=agt_vels,
        agt_trajs=agt_trajs,
        agt_traj_dirs=agt_traj_dirs,
        gt_preds=gt_preds,
        has_preds=has_preds,
        scen_mask=scen_mask,
        bands=bands,
    )
    return batch, stats
