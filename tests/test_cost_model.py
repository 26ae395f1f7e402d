"""Unit tests for the hand-counted Pallas cost model (ops/cost_model)."""

import numpy as np

from lanegcn_tpu.ops import cost_model


def test_recording_captures_and_restores():
    assert cost_model._ACTIVE is None
    with cost_model.recording() as recs:
        cost_model.record("row_tail", "fwd", n=1024, t=1024, c=128, k=1, db=2)
        assert len(recs) == 1
    assert cost_model._ACTIVE is None
    cost_model.record("row_tail", "fwd", n=1, t=1, c=1, k=1, db=2)  # no-op


def test_row_tail_formula():
    rec = {"family": "row_tail", "phase": "fwd", "n": 2048, "t": 1024,
           "c": 128, "k": 1, "db": 2}
    out = cost_model.resolve([rec])
    c = out["calls"][0]
    # MACs: b=2 tiles x K=1 x t x C^2
    assert c["mxu_macs"] == 2 * 1024 * 128 * 128
    # bytes: 2 tiles x 3 x t x C x 2B + params
    assert c["hbm_bytes"] == 2 * 3 * 1024 * 128 * 2 + (128 * 128 * 2 + 4 * 128 * 4)
    assert c["floor_ms"] > 0


def test_scenario_agg_uses_host_occupancy():
    # 2 windows, stride 768, ecap 1024; window 0 has 600 valid edges
    # (2 chunks of 512), window 1 empty.
    lu = np.full((2048, 1), -1, np.int32)
    lu[:600, 0] = np.arange(600) % 768
    rel = np.full((2048, 1), -1, np.int32)
    rel[:600, 0] = np.arange(600) % 14
    stats = {("scen", 2, 1024): cost_model._scen_plan_stats(lu, rel, 2)}
    rec = {"family": "scenario_agg", "phase": "fwd", "s": 2, "stride": 768,
           "ecap": 1024, "c": 128, "r": 14, "db": 2}
    out = cost_model.resolve([rec], stats)
    c = out["calls"][0]
    assert c["had_stats"]
    e, w, cc = 512, 768, 128
    assert c["mxu_macs"] == 2 * (2 * e * w * cc + 14 * e * cc * cc)
    assert c["useful_macs"] == 600 * cc * cc
    # MAC inflation must be visible (one-hot + all-relation masking)
    fam = out["families"]["scenario_agg:fwd"]
    assert fam["mac_inflation"] > 10


def test_pair_plan_stats_runs():
    class P:
        idx = np.array([[0, 1, 0]] * 128 + [[-1, -1, -1]] * 128, np.int32)
        meta = np.array([[0, 1], [0, 0], [1, 0], [0, 1], [0, 0], [1, 0]], np.int32)
        chunk = 128
        dst_stride = 128
        src_stride = 128
    st = cost_model._pair_plan_stats(P())
    assert st["nonempty"] == 1
    assert st["valid_edges"] == 128
    assert st["druns"] == 2  # dwin = [0, 1]
    assert st["strans"] == 1  # swin = [0, 0]


def test_floor_binding_attribution():
    # A huge-MAC record must bind on mxu; a byte-heavy one on hbm.
    mxu_rec = {"family": "scenario_agg", "phase": "bwd", "s": 272,
               "stride": 768, "ecap": 2048, "c": 128, "r": 14, "db": 2}
    byte_rec = {"family": "row_tail", "phase": "fwd", "n": 1 << 20, "t": 1024,
                "c": 128, "k": 1, "db": 2}
    out = cost_model.resolve([mxu_rec, byte_rec])
    assert out["calls"][0]["binding"] == "mxu"
    assert out["calls"][1]["binding"] == "hbm"


def test_step_floor_combines_xla_and_pallas():
    rec = {"family": "row_tail", "phase": "fwd", "n": 2048, "t": 1024,
           "c": 128, "k": 1, "db": 2}

    class Empty:
        pass

    out = cost_model.step_floor([rec], Empty(), xla_bytes=819e9 * 0.010,
                                xla_flops=0.0, device_kind="TPU v5 lite")
    t = out["totals"]
    assert abs(t["xla_floor_ms"] - 10.0) < 1e-6
    assert t["true_floor_ms"] > 10.0
