"""Synthetic lane-graph scenario generator.

Stands in for Argoverse raw data (unavailable offline) with statistically
similar scenarios: corridors of parallel connected lanes (successor chains,
left/right neighbors, 2.5 m segments), agents following lanes with noise,
partial observation dropout. Feeds the exact production pipeline
(featurize_scenario + build_lane_graph), so tests and benchmarks exercise
the real code path at realistic sizes (~600-1500 lane nodes, 5-25 actors).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from lanegcn_tpu.data.featurize import featurize_scenario
from lanegcn_tpu.data.lane_graph import Lane, build_lane_graph


def _make_corridor(rng: np.random.Generator, lane_id0: int, num_parallel: int, chain_len: int):
    """One corridor: num_parallel lanes side by side, each a chain of
    chain_len lane records with 9 segments each."""
    seg_len = 2.5
    segs_per_lane = 9
    total = chain_len * segs_per_lane + 1
    start = rng.uniform(-60, 60, size=2)
    heading = rng.uniform(0, 2 * np.pi)
    curv = rng.normal(0.0, 0.01)
    headings = heading + np.cumsum(np.full(total - 1, curv) + rng.normal(0, 0.004, total - 1))
    dirs = np.stack([np.cos(headings), np.sin(headings)], axis=1)
    base = np.concatenate([start[None, :], start[None, :] + np.cumsum(dirs * seg_len, 0)], 0)

    normal = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)
    normal = np.concatenate([normal[:1], normal], 0)

    lanes: List[Lane] = []
    lane_width = 3.5
    turn = rng.choice(["NONE", "NONE", "NONE", "LEFT", "RIGHT"])
    control = bool(rng.random() < 0.3)
    inter = bool(rng.random() < 0.2)
    ids = np.arange(num_parallel * chain_len).reshape(num_parallel, chain_len) + lane_id0
    for p in range(num_parallel):
        pts = base + normal * (p * lane_width)
        for c in range(chain_len):
            cl = pts[c * segs_per_lane : (c + 1) * segs_per_lane + 1]
            lanes.append(
                Lane(
                    lane_id=int(ids[p, c]),
                    centerline=cl,
                    predecessors=[int(ids[p, c - 1])] if c > 0 else [],
                    successors=[int(ids[p, c + 1])] if c < chain_len - 1 else [],
                    left_neighbor=int(ids[p + 1, c]) if p + 1 < num_parallel else None,
                    right_neighbor=int(ids[p - 1, c]) if p > 0 else None,
                    turn_direction=turn,
                    has_traffic_control=control,
                    is_intersection=inter,
                )
            )
    centerline_full = [base + normal * (p * lane_width) for p in range(num_parallel)]
    return lanes, centerline_full


def _actor_traj(rng: np.random.Generator, path: np.ndarray, num_steps: int = 50):
    """Follow a polyline path at a noisy constant speed; returns [T, 2]."""
    seg = np.diff(path, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    arc = np.concatenate([[0.0], np.cumsum(seg_len)])
    speed = rng.uniform(2.0, 12.0)
    start_s = rng.uniform(0, max(arc[-1] - speed * num_steps * 0.1, 1.0))
    s = start_s + speed * 0.1 * np.arange(num_steps)
    s = np.clip(s, 0, arc[-1] - 1e-3)
    idx = np.searchsorted(arc, s, side="right") - 1
    idx = np.clip(idx, 0, len(seg) - 1)
    frac = (s - arc[idx]) / np.maximum(seg_len[idx], 1e-6)
    pts = path[idx] + seg[idx] * frac[:, None]
    pts = pts + rng.normal(0, 0.05, pts.shape)
    return pts


def make_synthetic_scenario(
    seed: int,
    num_corridors: int = 4,
    num_actors: int = 12,
    num_hist: int = 20,
    num_pred: int = 30,
    num_scales: int = 6,
) -> Dict:
    """One scenario dict: featurized actors + node-level lane graph."""
    rng = np.random.default_rng(seed)
    lanes: List[Lane] = []
    paths = []
    lane_id0 = 0
    for _ in range(num_corridors):
        num_parallel = int(rng.integers(1, 4))
        chain_len = int(rng.integers(4, 8))
        cor_lanes, cor_paths = _make_corridor(rng, lane_id0, num_parallel, chain_len)
        lanes += cor_lanes
        paths += cor_paths
        lane_id0 += num_parallel * chain_len

    num_steps = num_hist + num_pred
    trajs, steps = [], []
    # AGENT: fully observed.
    trajs.append(_actor_traj(rng, paths[int(rng.integers(0, len(paths)))], num_steps))
    steps.append(np.arange(num_steps))
    for _ in range(num_actors - 1):
        tr = _actor_traj(rng, paths[int(rng.integers(0, len(paths)))], num_steps)
        # Random observation window (some actors appear late / disappear).
        t0 = int(rng.integers(0, num_hist))
        t1 = int(rng.integers(num_hist, num_steps + 1))
        keep = np.arange(t0, t1)
        trajs.append(tr[keep])
        steps.append(keep)

    data = featurize_scenario(trajs, steps, num_hist, num_pred)

    # Build the graph in the agent frame (reference rotates centerlines into
    # the agent frame before graph construction, data.py:231).
    rot, orig = data["rot"], data["orig"]
    rot_lanes = [
        Lane(
            ln.id,
            np.matmul(rot, (ln.centerline - orig.reshape(-1, 2)).T).T,
            ln.predecessors,
            ln.successors,
            ln.left_neighbor,
            ln.right_neighbor,
            ln.turn_direction,
            ln.has_traffic_control,
            ln.is_intersection,
        )
        for ln in lanes
    ]
    data["graph"] = build_lane_graph(rot_lanes, num_scales=num_scales)
    # Submission identity (reference attaches argo_id/city, data.py:364-434).
    data["seq_id"] = int(seed)
    data["city"] = "SYN"
    return data
