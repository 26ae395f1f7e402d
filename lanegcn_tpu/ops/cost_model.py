"""Hand-counted cost model for the Pallas kernel families: the TRUE roofline.

XLA's cost analysis cannot see inside Pallas custom calls — the compiled
program's aggregate "bytes accessed" / "flops" charge them ZERO (verified:
a program containing only a pallas_call reports no aggregate bytes key at
all). The published `pct_of_bw_roofline` therefore understated the floor
of this program more every time work moved from XLA ops into kernels
(42% → 37% → 32% across rounds 2-4 while the step got *faster*).

This module replaces that with an analytic accounting. Every Pallas
family's grid and block shapes are static, so its HBM traffic and MXU
MACs are exactly computable:

- HBM bytes: for each operand/output, one block fetch/write per CHANGE of
  its block index along the sequential grid (Mosaic keeps a block resident
  while consecutive grid steps map to the same index — weights with
  constant index maps are charged once; destination blocks once per run of
  consecutive chunks). Manually-DMA'd windows (ops/pallas_lane_layer) are
  charged per grid step at their windowed size.
- MXU MACs: the dot_generals the kernel body issues, including the
  one-hot gather/scatter matmuls — the formulation's structural overhead
  is COUNTED AS WORK here, and reported separately as `useful_macs`
  (the C² relation/MLP transforms an oracle formulation would need) so
  the MAC-inflation factor of the one-hot formulation is visible.
- VPU ops: rough elementwise estimates (one-hot iota/compare builds, GN
  chains, relu/masking) — order-of-magnitude, for attribution only.

Per-kernel floor: max(bytes/BW_peak, MACs/MXU_peak, VPU/VPU_peak) —
attainable only with perfect overlap inside the kernel. The whole-step
floor adds the XLA-side remainder (cost-analysis bytes/flops, which
exclude the kernels) as its own max() term:

    true_floor_ms = xla_floor + Σ_kernel-calls floor_kernel

`pct_of_true_floor = true_floor / measured` is the number bench.py
publishes (BENCH_r05+). Dynamic plan occupancy (valid edges per window,
chunk-run structure) is resolved host-side from the pre-transfer pack via
`plan_stats()` — the kernels record static geometry at trace time and the
stats attach by geometry key.

Recording: `with recording() as recs:` then trace the step (e.g.
`step.lower(...)`); each instrumented kernel entry appends one record per
Python call (= per appearance in the traced program, fwd and bwd).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any

import numpy as np

# ---------------------------------------------------------------------------
# Device peaks.

@dataclasses.dataclass(frozen=True)
class DevicePeaks:
    name: str
    hbm_bw: float        # bytes/s
    mxu_bf16: float      # MAC/s with bf16 multiplicands (FLOP/s = 2x)
    vpu: float           # elementwise f32 ops/s (estimate)

    def mac_rate(self, in_bytes: int) -> float:
        # f32 multiplicands run the MXU at ~1/4 the bf16 rate (3-pass).
        return self.mxu_bf16 if in_bytes <= 2 else self.mxu_bf16 / 4.0


_PEAKS = {
    # VPU: lanes(8x128) x ~4 ALUs x clock — estimate, used for attribution
    # only (public figures exist for HBM BW and MXU peaks; clocks derived
    # from the bf16 peak at 4 MXUs of 128x128 MACs/cycle).
    "tpu v4": DevicePeaks("TPU v4", 1228e9, 275e12 / 2, 4e12),
    "tpu v5 lite": DevicePeaks("TPU v5e", 819e9, 197e12 / 2, 6e12),
    "tpu v5e": DevicePeaks("TPU v5e", 819e9, 197e12 / 2, 6e12),
    "tpu v5p": DevicePeaks("TPU v5p", 2765e9, 459e12 / 2, 8e12),
    "tpu v6e": DevicePeaks("TPU v6e", 1638e9, 918e12 / 2, 12e12),
}


def peaks_for(device_kind: str) -> DevicePeaks:
    dk = device_kind.lower()
    for k, v in _PEAKS.items():
        if k in dk:
            return v
    return _PEAKS["tpu v5 lite"]


# ---------------------------------------------------------------------------
# Recording.

_ACTIVE: list | None = None


@contextlib.contextmanager
def recording():
    """Collect kernel-call records while tracing a jitted function."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = []
    try:
        yield _ACTIVE
    finally:
        _ACTIVE = prev


def record(family: str, phase: str, **geom) -> None:
    """Called by each instrumented Pallas entry point at trace time."""
    if _ACTIVE is not None:
        _ACTIVE.append({"family": family, "phase": phase, **geom})


# ---------------------------------------------------------------------------
# Host-side plan occupancy (from the pre-transfer pack).

def _runs(a: np.ndarray) -> int:
    """Number of maximal runs of equal consecutive values."""
    if a.size == 0:
        return 0
    return 1 + int(np.sum(a[1:] != a[:-1]))


def _pair_plan_stats(plan) -> dict:
    lu = np.asarray(plan.idx[:, 0])
    nc = plan.meta.shape[1]
    ch = lu.shape[0] // nc
    nv = (lu >= 0).reshape(nc, ch).sum(axis=1)
    meta = np.asarray(plan.meta)
    dwin, swin, sperm, sswin = meta[0], meta[1], meta[3], meta[4]
    return {
        "kind": "pair",
        "key": (nc, ch, int(plan.dst_stride), int(plan.src_stride)),
        "nonempty": int(np.sum(nv > 0)),
        "valid_edges": int(nv.sum()),
        "druns": _runs(dwin),
        "struns": _runs(sswin),
        # src-block fetches in chunk (dwin-sorted) order: one per run of
        # equal consecutive swin values.
        "strans": _runs(swin),
    }


def _scen_plan_stats(plan_lu, plan_rel, num_scen: int) -> dict:
    lu = np.asarray(plan_lu)[:, 0]
    rel = np.asarray(plan_rel)[:, 0]
    ecap = lu.shape[0] // num_scen
    vmask = (lu >= 0).reshape(num_scen, ecap)
    valid = vmask.sum(axis=1)
    relw = rel.reshape(num_scen, ecap)
    nrel = int(relw.max()) + 1 if vmask.any() else 1
    # per-window per-relation counts: lets the grouped-kernel cost compute
    # chunk counts for any relation grouping.
    rc = np.zeros((num_scen, nrel), np.int64)
    for w in range(num_scen):
        rc[w] = np.bincount(relw[w][vmask[w]], minlength=nrel)
    chunk = 512  # ops/pallas_scenario_agg._CHUNK
    return {
        "kind": "scen",
        "key": (num_scen, ecap),
        "chunks_total": int(np.sum(-(-valid // chunk))),
        "valid_edges": int(valid.sum()),
        "rel_counts": rc,
    }


def _win_scatter_stats(edges) -> dict:
    wchunk = np.asarray(edges.win_chunk)
    nch = wchunk.shape[0]
    return {
        "kind": "wscatter",
        "key": (nch, int(edges.win_stride)),
        "wruns": _runs(wchunk),
    }


def plan_stats(batch) -> dict[tuple, dict]:
    """Walk a packed batch (host numpy, pre-transfer) and extract the
    dynamic occupancy every plan-consuming kernel needs, keyed by the
    geometry the kernels record. Plans sharing a geometry key (e.g. two
    pooling directions at identical capacities) are averaged."""
    found: list[dict] = []

    def walk(obj, depth=0):
        if obj is None or depth > 6:
            return
        cls = type(obj).__name__
        if cls == "PairPlan":
            found.append(_pair_plan_stats(obj))
            return
        if cls == "EdgeSet":
            if getattr(obj, "win_lu", None) is not None:
                found.append(_win_scatter_stats(obj))
            return
        if hasattr(obj, "plan_lu") and getattr(obj, "plan_lu", None) is not None:
            ps = getattr(obj, "plan_scen", 0)
            if ps:
                found.append(_scen_plan_stats(obj.plan_lu, obj.plan_rel, ps))
        if dataclasses.is_dataclass(obj):
            for f in dataclasses.fields(obj):
                walk(getattr(obj, f.name), depth + 1)
        elif isinstance(obj, dict):
            for v in obj.values():
                walk(v, depth + 1)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                walk(v, depth + 1)

    walk(batch)
    by_key: dict[tuple, list[dict]] = {}
    for st in found:
        by_key.setdefault((st["kind"],) + st["key"], []).append(st)
    out = {}
    for key, group in by_key.items():
        merged = dict(group[0])
        for fld in ("nonempty", "druns", "struns", "strans", "chunks_total",
                    "wruns", "valid_edges"):
            if fld in merged:
                merged[fld] = float(np.mean([g[fld] for g in group]))
        out[key] = merged
    return out


# ---------------------------------------------------------------------------
# Per-family cost formulas.  Each returns a dict with hbm_bytes, mxu_macs,
# useful_macs, vpu_ops.  Citations: grid/block structure of the named file.

_SCEN_CHUNK = 512  # ops/pallas_scenario_agg._CHUNK


def _cost_lane_layer(r, st):
    # ops/pallas_lane_layer.py: grid (n/t,), manual-DMA windows, weights
    # charged once (constant index maps).
    n, c, t, j, db = r["n"], r["c"], r["t"], r["j"], r["db"]
    b = n // t
    halo = 32
    if r["phase"] == "fwd":
        per_step = ((t + 2 * halo) * c * db        # feat window DMA
                    + (t + 2 * halo) * 128 * db    # mask plane DMA
                    + t * c * db                   # pre block
                    + t * c * db                   # out
                    + (t * c * 4 if r["save_temp"] else 0))
        weights = (j + 1) * c * c * db + 4 * c * 4
        macs = b * (j + 1) * t * c * c
        vpu = b * t * c * (j + 25)
    else:
        w2n = t + 2 * halo
        per_step = ((t + 4 * halo) * c * db        # feat (double halo)
                    + w2n * c * db                 # g window
                    + w2n * c * 4                  # saved temp (f32)
                    + w2n * 128 * db               # mask plane
                    + 2 * t * c * db)              # dx + dpre
        weights = (j + 1) * c * c * db + 4 * c * 4 \
            + (j + 1) * c * c * 4 + 8 * c * 4      # param grads written once
        macs = b * (2 * w2n + (1 + 2 * j) * t) * c * c
        vpu = b * t * c * (2 * j + 50)
    return {
        "hbm_bytes": b * per_step + weights,
        "mxu_macs": macs,
        "useful_macs": macs,  # band matmuls are real work (dense-equivalent)
        "vpu_ops": vpu,
    }


def _cost_scenario_agg(r, st):
    # ops/pallas_scenario_agg.py: grid (num_windows,), chunked one-hot
    # gather/relation/scatter matmuls; all-padding chunks skipped via
    # scalar prefetch; relation-GROUPED chunks run only their group's
    # matmuls (chunk counts per group from host plan occupancy).
    s, w, ecap, c, rr, db = r["s"], r["stride"], r["ecap"], r["c"], r["r"], r["db"]
    e = _SCEN_CHUNK
    groups = r.get("groups") or (tuple(range(rr)),)
    # (chunks, relations-per-chunk) pairs per group.
    if st is not None and "rel_counts" in st and len(groups) > 1:
        rc = st["rel_counts"]
        per_group = []
        for grp in groups:
            ids = [g for g in grp if g < rc.shape[1]]
            cnt = rc[:, ids].sum(axis=1)
            per_group.append((int(np.sum(-(-cnt // e))), len(grp)))
    elif st is not None:
        per_group = [(st["chunks_total"], rr)]
    else:
        per_group = [(s * (ecap // e), rr)]
    valid_edges = st["valid_edges"] if st else sum(ch for ch, _ in per_group) * e
    macs = vpu = 0
    for ch, ng in per_group:
        if r["phase"] == "fwd":
            macs += ch * (2 * e * w * c + ng * e * c * c)
            vpu += ch * (2 * 3 * e * w + ng * e * c + ng * e)
        else:
            macs += ch * (3 * e * w * c + 2 * ng * e * c * c)
            vpu += ch * (3 * 3 * e * w + 2 * ng * e * c + ng * e)
    if r["phase"] == "fwd":
        byts = s * (3 * w * c * db + 3 * ecap * 4) + rr * c * c * db
    else:
        byts = s * (3 * w * c * db + 3 * ecap * 4) \
            + rr * c * c * db + rr * c * c * 4
    return {"hbm_bytes": byts, "mxu_macs": macs,
            "useful_macs": valid_edges * c * c * (1 if r["phase"] == "fwd" else 2),
            "vpu_ops": vpu}


def _cost_pair_agg(r, st):
    # ops/pallas_pair_agg.py: grid (nc,), (dwin, swin)-sorted chunk pairs.
    nc, e, sd, ss, c, rr, db = (r["nc"], r["chunk"], r["sd"], r["ss"],
                                r["c"], r["r"], r["db"])
    ne = st["nonempty"] if st else nc
    druns = st["druns"] if st else nc
    strans = st["strans"] if st else nc
    struns = st["struns"] if st else nc
    if r["phase"] == "fwd":
        byts = (nc * 3 * e * 4 + druns * 3 * sd * c * db
                + strans * ss * c * db + rr * c * c * db)
        macs = ne * (e * ss * c + rr * e * c * c + e * sd * c)
        vpu = ne * (3 * e * (sd + ss) + rr * e * c)
    elif r["phase"] == "bwd_d":
        byts = (nc * (3 * e * 4 + e * c * db) + druns * sd * c * db
                + strans * ss * c * db + rr * c * c * db + rr * c * c * 4)
        macs = ne * (e * sd * c + e * ss * c + 2 * rr * e * c * c)
        vpu = ne * (3 * e * (sd + ss) + 2 * rr * e * c)
    else:  # bwd_s
        byts = nc * (e * c * db + e * 4) + struns * 3 * ss * c * db
        macs = ne * e * ss * c
        vpu = ne * 3 * e * ss
    ve = st["valid_edges"] if st else ne * e
    return {"hbm_bytes": byts, "mxu_macs": macs,
            "useful_macs": ve * c * c
            * (1 if r["phase"] == "fwd" else (2 if r["phase"] == "bwd_d" else 0)),
            "vpu_ops": vpu}


def _cost_win_edge(r, st):
    # ops/pallas_win_edge.py: fused Att/LanePooling edge chain over
    # (dwin, swin) chunk pairs.
    nc, e, sd, ss, c, db = r["nc"], r["chunk"], r["sd"], r["ss"], r["c"], r["db"]
    hq, hd2 = r["has_query"], r["has_dist2"]
    ne = st["nonempty"] if st else nc
    druns = st["druns"] if st else nc
    strans = st["strans"] if st else nc
    struns = st["struns"] if st else nc
    nlin = 1 + hd2 + 1  # kdo (hd2), k1, kout
    if r["phase"] == "fwd":
        byts = (nc * 2 * e * 4
                + druns * (3 + hq) * sd * c * db      # pd, qd, temp, out
                + strans * 2 * ss * c * db            # ps, cs
                + (nlin * c * c + 8 * c) * db)
        macs = ne * (e * c * ((2 + hq) * sd + 2 * ss) + nlin * e * c * c)
        vpu = ne * (3 * e * (sd + ss) + 25 * e * c)
    elif r["phase"] == "bwd_d":
        byts = (nc * (2 * e * 4 + 2 * e * c * db)     # lu/lv + ds/dt1 saves
                + druns * (2 * (2 + hq)) * sd * c * db  # pd,qd,g,zeros + dpd,dqd
                + strans * 2 * ss * c * db
                + (nlin * c * c + 8 * c) * db + (nlin * c * c + 8 * c) * 4)
        macs = ne * (e * c * ((2 + 2 * hq + 1) * sd + 2 * ss)
                     + (2 * nlin + 1 + hd2) * e * c * c)
        vpu = ne * (4 * e * (sd + ss) + 50 * e * c)
    else:  # bwd_s
        byts = nc * (2 * e * c * db + e * 4) + struns * 4 * ss * c * db
        macs = ne * 2 * e * ss * c
        vpu = ne * 3 * e * ss
    ve = st["valid_edges"] if st else ne * e
    return {"hbm_bytes": byts, "mxu_macs": macs,
            "useful_macs": ve * c * c * (nlin if r["phase"] == "fwd"
                                         else (2 * nlin if r["phase"] == "bwd_d" else 0)),
            "vpu_ops": vpu}


def _cost_window_scatter(r, st):
    # ops/pallas_window_scatter.py: one one-hot matmul per 512-edge chunk,
    # destination block resident across its consecutive chunks.
    nch, e, stride, c, db = r["nch"], r["chunk"], r["stride"], r["c"], r["db"]
    wruns = st["wruns"] if st else nch
    if r["phase"] == "fwd":
        byts = nch * (e * c * db + e * 4) + wruns * 2 * stride * c * db
    else:
        byts = nch * (e * c * db + e * 4) + wruns * stride * c * db
    return {"hbm_bytes": byts, "mxu_macs": nch * e * stride * c,
            "useful_macs": 0, "vpu_ops": nch * 3 * e * stride}


def _cost_edge_mlp(r, st):
    # ops/pallas_edge_mlp.py: per-edge MLP chain over row tiles.
    e, t, c, din, db = r["e"], r["t"], r["c"], r["din"], r["db"]
    hq, hd2 = r["has_query"], r["has_dist2"]
    b = e // t
    nlin = hd2 + 2  # kdo?, k1, kout
    if r["phase"] == "fwd":
        byts = b * t * ((din + (1 + hq) * c + c) * db) \
            + (din * c + nlin * c * c + 10 * c) * db
        macs = b * t * (din * c + nlin * c * c)
        vpu = b * t * c * 25
    else:
        byts = b * t * ((din + (1 + hq) * c + c) * db        # inputs + g
                        + (din + (1 + hq) * c) * db)          # dd, dcg, dqg
        byts += (din * c + nlin * c * c + 10 * c) * (db + 4)
        macs = b * t * (2 * din * c + (3 * nlin) * c * c)
        vpu = b * t * c * 50
    return {"hbm_bytes": byts, "mxu_macs": macs, "useful_macs": macs,
            "vpu_ops": vpu}


def _cost_row_tail(r, st):
    # ops/pallas_row_tail.py: K-stage fused GN/Linear residual tail.
    n, t, c, k, db = r["n"], r["t"], r["c"], r["k"], r["db"]
    b = n // t
    if r["phase"] == "fwd":
        byts = b * 3 * t * c * db + (k * c * c * db + 2 * (k + 1) * c * 4)
        macs = b * k * t * c * c
    else:
        byts = b * 5 * t * c * db \
            + (k * c * c * db + 2 * (k + 1) * c * 4) \
            + (k * c * c * 4 + (4 * k + 8) * c * 4)
        macs = b * 3 * k * t * c * c
    return {"hbm_bytes": byts, "mxu_macs": macs, "useful_macs": macs,
            "vpu_ops": b * t * c * 20 * (k + 1)}


def _cost_lane_plan_layer(r, st):
    # ops/pallas_lane_layer.py fused_lane_layer_plan: the LaneConv layer
    # with the window plan applied in-kernel — lane_layer's costs plus the
    # plan's MXU/VPU work, but NO separate feat/temp/out window traffic
    # (the plan reads the layer's resident x window); only lu/lv/rel and
    # the relation weights add bytes.
    base = _cost_lane_layer(r, None)
    e = _SCEN_CHUNK
    s_, ecap, c, rr, db = r["s"], r["ecap"], r["c"], r["r"], r["db"]
    w = r["n"] // r["s"]  # tile == window stride
    groups = r.get("groups") or (tuple(range(rr)),)
    if st is not None and "rel_counts" in st and len(groups) > 1:
        rc = st["rel_counts"]
        per_group = []
        for grp in groups:
            ids = [gid for gid in grp if gid < rc.shape[1]]
            cnt = rc[:, ids].sum(axis=1)
            per_group.append((int(np.sum(-(-cnt // e))), len(grp)))
        valid_edges = st["valid_edges"]
    elif st is not None:
        per_group = [(st["chunks_total"], rr)]
        valid_edges = st["valid_edges"]
    else:
        per_group = [(s_ * (ecap // e), rr)]
        valid_edges = sum(ch for ch, _ in per_group) * e
    macs = vpu = 0
    for ch, ng in per_group:
        if r["phase"] == "fwd":
            macs += ch * (2 * e * w * c + ng * e * c * c)
            vpu += ch * (2 * 3 * e * w + ng * e * c + ng * e)
        else:
            macs += ch * (3 * e * w * c + 2 * ng * e * c * c)
            vpu += ch * (3 * 3 * e * w + 2 * ng * e * c + ng * e)
    byts = s_ * 3 * ecap * 4 + rr * c * c * db \
        + (rr * c * c * (db + 4) if r["phase"] == "bwd" else 0)
    return {
        "hbm_bytes": base["hbm_bytes"] + byts,
        "mxu_macs": base["mxu_macs"] + macs,
        "useful_macs": base["useful_macs"]
        + valid_edges * c * c * (1 if r["phase"] == "fwd" else 2),
        "vpu_ops": base["vpu_ops"] + vpu,
    }


_COSTS = {
    "lane_layer": _cost_lane_layer,
    "lane_plan_layer": _cost_lane_plan_layer,
    "scenario_agg": _cost_scenario_agg,
    "pair_agg": _cost_pair_agg,
    "win_edge": _cost_win_edge,
    "window_scatter": _cost_window_scatter,
    "edge_mlp": _cost_edge_mlp,
    "row_tail": _cost_row_tail,
}

_STAT_KEY = {
    "scenario_agg": lambda r: ("scen", r["s"], r["ecap"]),
    "lane_plan_layer": lambda r: ("scen", r["s"], r["ecap"]),
    "pair_agg": lambda r: ("pair", r["nc"], r["chunk"], r["sd"], r["ss"]),
    "win_edge": lambda r: ("pair", r["nc"], r["chunk"], r["sd"], r["ss"]),
    "window_scatter": lambda r: ("wscatter", r["nch"], r["stride"]),
}


def resolve(records: list[dict], stats: dict[tuple, dict] | None = None,
            device_kind: str = "TPU v5 lite") -> dict:
    """Attach occupancy stats, evaluate cost formulas, and aggregate.

    Returns {"calls": [...], "families": {...}, "totals": {...}} where each
    call carries hbm_bytes / mxu_macs / vpu_ops / floor_ms / binding."""
    dev = peaks_for(device_kind)
    calls = []
    for r in records:
        fam = r["family"]
        st = None
        if stats is not None and fam in _STAT_KEY:
            st = stats.get(_STAT_KEY[fam](r))
        cost = _COSTS[fam](r, st)
        rate = dev.mac_rate(r.get("db", 2))
        t_b = cost["hbm_bytes"] / dev.hbm_bw
        t_m = cost["mxu_macs"] / rate
        t_v = cost["vpu_ops"] / dev.vpu
        floor = max(t_b, t_m, t_v)
        binding = ("hbm" if floor == t_b else "mxu" if floor == t_m else "vpu")
        calls.append({
            **r, **cost, "floor_ms": 1e3 * floor, "binding": binding,
            "t_bytes_ms": 1e3 * t_b, "t_mxu_ms": 1e3 * t_m, "t_vpu_ms": 1e3 * t_v,
            "had_stats": st is not None,
        })
    fams: dict[str, dict] = {}
    for c in calls:
        f = fams.setdefault(c["family"] + ":" + c["phase"].split("_")[0], {
            "calls": 0, "hbm_bytes": 0, "mxu_macs": 0, "useful_macs": 0,
            "vpu_ops": 0, "floor_ms": 0.0,
            "t_bytes_ms": 0.0, "t_mxu_ms": 0.0, "t_vpu_ms": 0.0,
        })
        f["calls"] += 1
        for k in ("hbm_bytes", "mxu_macs", "useful_macs", "vpu_ops"):
            f[k] += c[k]
        for k in ("floor_ms", "t_bytes_ms", "t_mxu_ms", "t_vpu_ms"):
            f[k] += c[k]
    for f in fams.values():
        f["binding"] = max(
            ("hbm", "mxu", "vpu"),
            key=lambda b: f[{"hbm": "t_bytes_ms", "mxu": "t_mxu_ms",
                             "vpu": "t_vpu_ms"}[b]],
        )
        f["mac_inflation"] = (f["mxu_macs"] / f["useful_macs"]
                              if f["useful_macs"] else float("inf"))
    totals = {
        "pallas_floor_ms": sum(c["floor_ms"] for c in calls),
        "pallas_bytes": sum(c["hbm_bytes"] for c in calls),
        "pallas_macs": sum(c["mxu_macs"] for c in calls),
        "pallas_useful_macs": sum(c["useful_macs"] for c in calls),
    }
    return {"calls": calls, "families": fams, "totals": totals, "device": dev}


def step_floor(records: list[dict], batch, xla_bytes: float, xla_flops: float,
               device_kind: str) -> dict:
    """Whole-step true floor: XLA remainder (cost analysis excludes the
    Pallas custom calls — verified) + per-kernel analytic floors."""
    stats = plan_stats(batch)
    res = resolve(records, stats, device_kind)
    dev = res["device"]
    xla_floor = max(xla_bytes / dev.hbm_bw, xla_flops / (2 * dev.mxu_bf16))
    res["totals"]["xla_bytes"] = xla_bytes
    res["totals"]["xla_flops"] = xla_flops
    res["totals"]["xla_floor_ms"] = 1e3 * xla_floor
    res["totals"]["true_floor_ms"] = (
        1e3 * xla_floor + res["totals"]["pallas_floor_ms"]
    )
    return res
