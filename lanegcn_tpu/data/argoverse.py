"""Argoverse v1.1 motion-forecasting data: CSV reader + map adapter.

Real-data counterpart of the reference's raw path (reference data.py:107-361):
- read_argo_csv: parse one scenario CSV into per-track trajectories grouped
  by (TRACK_ID, OBJECT_TYPE) with the AGENT first,
- MapProvider protocol: lanes within a radius of a point, as
  lane_graph.Lane records (adapters: ArgoverseMapProvider wraps the
  argoverse-api map when installed; tests use synthetic maps),
- ArgoScenarioDataset: CSV dir + MapProvider → featurized scenario dicts
  through the same featurize_scenario/build_lane_graph pipeline as synthetic
  data.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Protocol, Sequence

import numpy as np

from lanegcn_tpu.data.featurize import featurize_scenario
from lanegcn_tpu.data.lane_graph import Lane, build_lane_graph


def read_argo_csv(path: str) -> Dict:
    """Parse a scenario CSV (TIMESTAMP, TRACK_ID, OBJECT_TYPE, X, Y,
    CITY_NAME): timestamps mapped to dense step indices, tracks grouped by
    (TRACK_ID, OBJECT_TYPE), AGENT first (reference read_argo_data
    data.py:107-146)."""
    import pandas as pd

    df = pd.read_csv(path)
    agt_ts = np.sort(np.unique(df["TIMESTAMP"].values))
    mapping = {ts: i for i, ts in enumerate(agt_ts)}

    trajs = np.concatenate(
        (df.X.to_numpy().reshape(-1, 1), df.Y.to_numpy().reshape(-1, 1)), 1
    )
    steps = np.asarray([mapping[x] for x in df["TIMESTAMP"].values], np.int64)

    objs = df.groupby(["TRACK_ID", "OBJECT_TYPE"]).groups
    keys = list(objs.keys())
    obj_type = [x[1] for x in keys]
    agt_idx = obj_type.index("AGENT")
    idcs = objs[keys[agt_idx]]

    agt_traj = trajs[idcs]
    agt_step = steps[idcs]

    del keys[agt_idx]
    ctx_trajs, ctx_steps = [], []
    for key in keys:
        idcs = objs[key]
        ctx_trajs.append(trajs[idcs])
        ctx_steps.append(steps[idcs])

    city = str(df["CITY_NAME"].values[0]) if "CITY_NAME" in df else ""
    return {
        "city": city,
        "trajs": [agt_traj] + ctx_trajs,
        "steps": [agt_step] + ctx_steps,
    }


class MapProvider(Protocol):
    def lanes_in_radius(self, center: np.ndarray, city: str, radius: float) -> List[Lane]:
        """Lane records (world frame) within radius of center."""
        ...


class ArgoverseMapProvider:
    """Adapter over the argoverse-api map (lazy import; reference
    data.py:220-263 consumes the same fields)."""

    def __init__(self):
        from argoverse.map_representation.map_api import ArgoverseMap  # gated

        self.am = ArgoverseMap()

    def lanes_in_radius(self, center, city, radius):
        lane_ids = self.am.get_lane_ids_in_xy_bbox(center[0], center[1], city, radius)
        lanes = []
        for lid in lane_ids:
            ln = self.am.city_lane_centerlines_dict[city][lid]
            lanes.append(
                Lane(
                    lane_id=lid,
                    centerline=np.asarray(ln.centerline[:, :2], np.float32),
                    predecessors=ln.predecessors or [],
                    successors=ln.successors or [],
                    left_neighbor=ln.l_neighbor_id,
                    right_neighbor=ln.r_neighbor_id,
                    turn_direction=ln.turn_direction or "NONE",
                    has_traffic_control=bool(ln.has_traffic_control),
                    is_intersection=bool(ln.is_intersection),
                )
            )
        return lanes


def build_scenario(
    raw: Dict,
    map_provider: MapProvider,
    num_hist: int = 20,
    num_pred: int = 30,
    num_scales: int = 6,
    pred_range: Sequence[float] = (-100.0, 100.0, -100.0, 100.0),
    cross_dist: float = 6.0,
) -> Dict:
    """raw CSV dict + map → featurized scenario with agent-frame lane graph
    (reference ArgoDataset.__getitem__ raw path, data.py:84-99). Lanes are
    clipped to the pred_range box in the agent frame (data.py:230-241)."""
    data = featurize_scenario(
        raw["trajs"], raw["steps"], num_hist, num_pred, pred_range
    )
    x_min, x_max, y_min, y_max = pred_range
    radius = max(abs(x_min), abs(x_max)) + max(abs(y_min), abs(y_max))
    lanes = map_provider.lanes_in_radius(data["orig"], raw.get("city", ""), radius)

    rot, orig = data["rot"], data["orig"]
    clipped: List[Lane] = []
    for ln in lanes:
        cl = np.matmul(rot, (ln.centerline - orig.reshape(-1, 2)).T).T
        x, y = cl[:, 0], cl[:, 1]
        if x.max() < x_min or x.min() > x_max or y.max() < y_min or y.min() > y_max:
            continue
        clipped.append(
            Lane(
                ln.id, cl, ln.predecessors, ln.successors, ln.left_neighbor,
                ln.right_neighbor, ln.turn_direction, ln.has_traffic_control,
                ln.is_intersection,
            )
        )
    data["graph"] = build_lane_graph(clipped, num_scales=num_scales, cross_dist=cross_dist)
    data["city"] = raw.get("city", "")
    return data


class ArgoScenarioDataset:
    """Directory of scenario CSVs + a MapProvider → scenario dicts."""

    def __init__(
        self,
        csv_dir: str,
        map_provider: Optional[MapProvider] = None,
        num_scales: int = 6,
        with_rois: bool = False,
    ):
        self.paths = sorted(
            os.path.join(csv_dir, f) for f in os.listdir(csv_dir) if f.endswith(".csv")
        )
        self.map_provider = map_provider or ArgoverseMapProvider()
        self.num_scales = num_scales
        self.with_rois = with_rois

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Dict:
        raw = read_argo_csv(self.paths[idx])
        data = build_scenario(raw, self.map_provider, num_scales=self.num_scales)
        # Argoverse convention: the CSV filename stem is the sequence id
        # (reference ArgoTestDataset attaches argo_id, data.py:364-434).
        stem = os.path.splitext(os.path.basename(self.paths[idx]))[0]
        try:
            data["seq_id"] = int(stem)
        except ValueError:
            data["seq_id"] = idx
        if self.with_rois:
            from lanegcn_tpu.data.lane_roi import generate_lane_rois

            data = generate_lane_rois(data)
        return data
