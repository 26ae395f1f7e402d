"""Argoverse CSV reader + scenario build against a synthetic MapProvider."""

import numpy as np
import pandas as pd
import pytest

from lanegcn_tpu.data.argoverse import ArgoScenarioDataset, build_scenario, read_argo_csv
from lanegcn_tpu.data.lane_graph import Lane


def _write_csv(path, tracks):
    """tracks: list of (track_id, obj_type, xy[T,2], steps[T])."""
    rows = []
    ts0 = 315968222.0
    for tid, typ, xy, steps in tracks:
        for (x, y), s in zip(xy, steps):
            rows.append(
                {
                    "TIMESTAMP": ts0 + 0.1 * s,
                    "TRACK_ID": tid,
                    "OBJECT_TYPE": typ,
                    "X": x,
                    "Y": y,
                    "CITY_NAME": "PIT",
                }
            )
    # Shuffle rows to prove grouping doesn't rely on order.
    rng = np.random.default_rng(0)
    rng.shuffle(rows)
    pd.DataFrame(rows).to_csv(path, index=False)


@pytest.fixture
def csv_dir(tmp_path):
    t = np.arange(50)
    agent = np.stack([t * 1.0, np.zeros(50)], 1)
    other = np.stack([t * 0.5, np.full(50, 3.5)], 1)
    _write_csv(
        tmp_path / "1.csv",
        [
            ("av-1", "AV", other, t),
            ("agent-1", "AGENT", agent, t),
        ],
    )
    return str(tmp_path)


def test_read_argo_csv_agent_first(csv_dir):
    raw = read_argo_csv(csv_dir + "/1.csv")
    assert raw["city"] == "PIT"
    assert len(raw["trajs"]) == 2
    # AGENT first, sorted by timestamp mapping.
    agent = raw["trajs"][0][np.argsort(raw["steps"][0])]
    np.testing.assert_allclose(agent[:, 0], np.arange(50), atol=1e-6)


class StraightMap:
    def lanes_in_radius(self, center, city, radius):
        cl = np.stack([np.arange(-10.0, 110.0, 2.5), np.zeros(48)], 1)
        return [Lane(0, cl[:24], successors=[1]), Lane(1, cl[23:], predecessors=[0])]


def test_build_scenario_pipeline(csv_dir):
    raw = read_argo_csv(csv_dir + "/1.csv")
    data = build_scenario(raw, StraightMap(), num_scales=3)
    assert data["feats"].shape[0] == 2
    assert data["graph"]["num_nodes"] > 0
    # Lane nodes were rotated into the agent frame: the lane through the
    # agent's position passes near the origin.
    d = np.linalg.norm(data["graph"]["ctrs"], axis=1)
    assert d.min() < 3.0


def test_argo_dataset(csv_dir):
    ds = ArgoScenarioDataset(csv_dir, map_provider=StraightMap(), num_scales=3)
    assert len(ds) == 1
    scen = ds[0]
    assert scen["gt_preds"].shape == (2, 30, 2)
