"""Windowed (scenario-aligned) graph-parallel LaneGCN train step.

Every LaneGCN edge relation — intra-lane bands, dilated neighbors,
left/right, fusion a2m/m2a/a2a — is SCENARIO-LOCAL: the reference builds
each scenario's lane graph independently (data.py:220-361) and the
distance-thresholded fusion edges never cross scenarios (lanegcn.py:
672-689). Packs are scenario-partitioned, so cutting the graph axis ON
SCENARIO BOUNDARIES makes every edge shard-local BY CONSTRUCTION: each
device of the "graph" axis runs the UNMODIFIED single-chip fast path —
banded Pallas LaneConv layer, scenario-window plan kernel, window-pair
fused Att — on its own sub-pack (1/G of the scenarios at 1/G of every
capacity), and the only communication in the whole step is

  - all_gathers of the small outputs (cls/reg) + the loss-side pack fields
    along "graph", so the pack-JOINT loss normalization (num_cls/num_reg
    span the whole pack) matches the single-device step exactly, and
  - the gradient pmean.

Contrast with the source-partitioned explicit path (graph_parallel.py):
that path slices node rows at arbitrary boundaries, which forces the flat
einsum/scatter formulation per shard and one psum_scatter per LaneConv
layer + one all_gather/psum_scatter per Att (48 collectives / 34.5 MB per
step at data=2 x graph=2). It remains the right tool only when a SINGLE
graph outgrows one shard's memory — never the case at Argoverse scale
(≤ ~900 nodes/scenario). For scenario-local workloads the windowed path
dominates on both axes: per-shard compute IS the measured single-chip fast
path, and the collective count drops to the data-parallel floor plus two
output all_gathers. See docs/PERFORMANCE.md "Multi-chip" for the measured
comparison; gradient-scale correctness mirrors graph_parallel.py (the
replicated loss's cotangents are summed by all_gather's VJP, so each
shard's local gradient carries a factor of G — the pmean over "graph"
cancels it exactly).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lanegcn_tpu.config import Config, PackConfig, RoiPackConfig
from lanegcn_tpu.models.lanegcn import LaneGCN, agent_metrics, pred_loss
from lanegcn_tpu.train.optimizer import guarded_optimizer_step, optimizer_step


def scenario_weight(scen) -> int:
    """Packing weight of one scenario: lane nodes + graph edges + actors
    (the three capacity families windowed sub-packs divide by G). RoI
    scenarios additionally count their RoI subgraph nodes — the pool-edge
    and RoI-node caps are the tight ones there."""
    g = scen.get("graph") or {}
    ctrs = g.get("ctrs")
    nodes = int(g["num_nodes"]) if "num_nodes" in g else (
        len(ctrs) if ctrs is not None else 0
    )
    edges = 0
    for k in ("pre", "suc"):
        for e in g.get(k, ()):
            edges += len(e.get("u", ()))
    for k in ("left", "right"):
        d = g.get(k)
        if isinstance(d, dict):
            edges += len(d.get("u", ()))
    actors = len(scen.get("ctrs", ()))
    rois = scen.get("subgraphs") or ()  # LaneRCNN per-agent RoIs (lane_roi.py)
    roi_nodes = sum(
        len(r.get("ctrs", ())) if isinstance(r, dict) else 0 for r in rois
    )
    return nodes + edges // 4 + 8 * actors + 2 * roi_nodes


def balance_scenarios(scens, g: int, weight_fn=scenario_weight,
                      max_per_group: int | None = None):
    """Greedy LPT split of scenarios into g groups balanced by
    scenario_weight; returns g lists of indices, each in original order.

    Replaces the positional np.linspace split (round-5 VERDICT #4): at 1/G
    sub-capacities a skewed draw — a few dense urban scenarios landing in
    one positional shard — overflows that shard's caps and silently drops
    edges. Sorting by weight (descending) and assigning each scenario to
    the lightest group keeps the max group weight within ~one scenario of
    the mean. `max_per_group` caps group SIZE (the sub-pack's
    max_scenarios); full groups stop receiving. Deterministic: ties break
    on index."""
    weights = [int(weight_fn(s)) for s in scens]
    order = sorted(range(len(scens)), key=lambda i: (-weights[i], i))
    totals = [0] * g
    groups: list[list[int]] = [[] for _ in range(g)]
    for i in order:
        open_g = [k for k in range(g)
                  if max_per_group is None or len(groups[k]) < max_per_group]
        if not open_g:  # more scenarios than g*cap: overflow round-robins
            open_g = list(range(g))
        j = min(open_g, key=lambda k: (totals[k], k))
        totals[j] += weights[i]
        groups[j].append(i)
    return [sorted(grp) for grp in groups]


def subdivide_pack_config(cfg: PackConfig, g: int) -> PackConfig:
    """The sub-pack config for one graph shard: every capacity divided by
    G, alignment preserved. Scenario-aligned sharding = each shard packs
    its own 1/G of the scenarios with the SAME layout machinery."""
    if g == 1:
        return cfg

    def div(n: int, align: int = 1) -> int:
        assert n % g == 0 or align > 1, (n, g)
        return max(-(-n // g // align), 1) * align

    med = cfg.max_edges_dilated
    med_sub = (
        tuple(div(m, 128) for m in med)
        if isinstance(med, (tuple, list))
        else div(med, 128)
    )
    assert cfg.max_scenarios % g == 0, (cfg.max_scenarios, g)
    if cfg.node_stride:
        assert cfg.max_nodes % (g * cfg.node_stride) == 0, (
            "windowed sharding needs max_nodes divisible by G*node_stride"
        )
    if cfg.actor_stride:
        assert cfg.max_actors % (g * cfg.actor_stride) == 0, (
            "windowed sharding needs max_actors divisible by G*actor_stride"
        )
    return dataclasses.replace(
        cfg,
        max_scenarios=cfg.max_scenarios // g,
        max_actors=cfg.max_actors // g,
        max_nodes=cfg.max_nodes // g,
        max_edges_scale0=div(cfg.max_edges_scale0, 128),
        max_edges_dilated=med_sub,
        max_edges_lr=div(cfg.max_edges_lr, 128),
        max_a2m_edges=div(cfg.max_a2m_edges, cfg.pair_chunk),
        max_m2a_edges=div(cfg.max_m2a_edges, cfg.pair_chunk),
        max_a2a_edges=div(cfg.max_a2a_edges, cfg.pair_chunk),
        max_table_edges=div(cfg.max_table_edges) if cfg.max_table_edges else 0,
    )


def subdivide_roi_pack_config(cfg: RoiPackConfig, g: int) -> RoiPackConfig:
    """LaneRCNN sub-pack config for one graph shard (mirrors
    subdivide_pack_config; RoI subgraphs and the shared global graph are
    both per-scenario structures, so scenario-aligned shards hold whole
    RoIs + whole scenario graphs)."""
    if g == 1:
        return cfg
    from lanegcn_tpu.ops.pallas_window_scatter import _WCHUNK

    def div(n: int, align: int = 1) -> int:
        return max(-(-n // g // align), 1) * align

    assert cfg.max_scenarios % g == 0, (cfg.max_scenarios, g)
    stride = cfg.node_stride or 1
    g_stride = cfg.g_stride or 1
    return dataclasses.replace(
        cfg,
        max_scenarios=cfg.max_scenarios // g,
        max_rois=div(cfg.max_rois, 8),
        max_roi_nodes=div(cfg.max_roi_nodes, stride),
        max_interest_nodes=div(cfg.max_interest_nodes, 128),
        max_global_nodes=(
            div(cfg.max_global_nodes, g_stride) if cfg.max_global_nodes else 0
        ),
        max_edges_scale0=div(cfg.max_edges_scale0, 128),
        max_edges_dilated=div(cfg.max_edges_dilated, 128),
        max_edges_lr=div(cfg.max_edges_lr, 128),
        max_a2m_edges=div(cfg.max_a2m_edges, 128),
        # Pool edges stay _WCHUNK-divisible for the window-slotted scatter.
        # 1/G of the full cap is NOT enough: the per-destination-window
        # chunk alignment wastes up to _WCHUNK-1 slots per occupied window,
        # and G sub-packs touch ~the same window count as the full pack —
        # the round-5 dryrun drop assertion caught exactly this (44 pool
        # edges silently dropped at g=2 tiny caps, the source of round-4's
        # "5e-5 windowed loss deviation"). Add 4 chunks of alignment slack.
        max_pool_edges=div(cfg.max_pool_edges, _WCHUNK) + 4 * _WCHUNK,
        max_a2r_edges=div(cfg.max_a2r_edges, 128),
        max_table_edges=div(cfg.max_table_edges) if cfg.max_table_edges else 0,
    )


def _finish_step(tx, lr_fn, guard, params, opt_state, metrics, grads, epoch):
    """Shared step tail: G-fold-corrected gradient means, data-axis metric
    reduction, (guarded) optimizer update."""
    grads = jax.tree.map(
        lambda x: jax.lax.pmean(jax.lax.pmean(x, "graph"), "data"), grads
    )
    loss_mean = jax.lax.pmean(metrics["loss"], "data")
    metrics = {
        k: (jax.lax.psum(v, "data") if k != "loss" else loss_mean)
        for k, v in metrics.items()
    }
    lr = lr_fn(epoch)
    if guard:
        params, opt_state, ok = guarded_optimizer_step(
            tx, params, grads, opt_state, lr, loss_mean
        )
        metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
    else:
        params, opt_state = optimizer_step(tx, params, grads, opt_state, lr)
    metrics["lr"] = lr
    return params, opt_state, metrics


def make_windowed_parallel_roi_train_step(
    config: Config, net, tx, lr_fn, mesh: Mesh, loss_fn, metrics_fn,
):
    """LaneRCNN windowed (scenario-aligned) train step: per-shard compute is
    the unmodified RoI fast path (windowed RoI layouts, window-slotted pool
    scatter) on a sub-pack; the RoI loss/metrics are purely per-scenario
    ([B]-indexed), so the union view is three all_gathers."""
    guard = config.train.nan_guard

    def per_device(params, opt_state, batch, epoch):
        pack = jax.tree.map(lambda x: jnp.squeeze(jnp.squeeze(x, 0), 0), batch)
        ag = lambda x: jax.lax.all_gather(x, "graph", axis=0, tiled=True)

        def objective(p):
            out = net.apply({"params": p}, pack)
            out_full = jax.tree.map(lambda v: ag(v.astype(jnp.float32)), out)
            union = pack.replace(
                gt_preds=ag(pack.gt_preds),
                has_preds=ag(pack.has_preds),
                scen_mask=ag(pack.scen_mask),
            )
            losses = loss_fn(out_full, union, config.loss)
            m = dict(losses)
            m.update(metrics_fn(out_full, union))
            return losses["loss"], m

        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(params)
        return _finish_step(tx, lr_fn, guard, params, opt_state, metrics, grads, epoch)

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data", "graph"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0, 1))


def make_windowed_parallel_train_step(
    config: Config, tx, lr_fn, mesh: Mesh, loss_fn=None, metrics_fn=None,
    dtype=jnp.float32,
):
    """jit(shard_map) train step over a (data x graph) mesh with
    scenario-aligned graph shards.

    fn(params, opt_state, batch[D, G, ...], epoch) → (params, opt_state,
    metrics). batch = per-device sub-packs (subdivide_pack_config
    capacities) stacked on two leading axes. Loss/metric semantics match
    the single-device step on the UNION of each data row's G sub-packs.
    """
    loss_fn = loss_fn or pred_loss
    metrics_fn = metrics_fn or agent_metrics
    guard = config.train.nan_guard
    net = LaneGCN(config.model, dtype=dtype)

    def per_device(params, opt_state, batch, epoch):
        pack = jax.tree.map(lambda x: jnp.squeeze(jnp.squeeze(x, 0), 0), batch)
        sid = jax.lax.axis_index("graph")
        a_loc = pack.actors.mask.shape[0]

        ag = lambda x: jax.lax.all_gather(x, "graph", axis=0, tiled=True)

        def objective(p):
            out = net.apply({"params": p}, pack)  # full fast path, local rows
            out_full = {
                "cls": ag(out["cls"].astype(jnp.float32)),
                "reg": ag(out["reg"].astype(jnp.float32)),
            }
            # Union view of the loss-side fields: the pack-joint
            # normalization (num_cls/num_reg, metric supports) spans all G
            # sub-packs, exactly like one big pack on one device.
            union = pack.replace(
                gt_preds=ag(pack.gt_preds),
                has_preds=ag(pack.has_preds),
                actors=pack.actors.replace(mask=ag(pack.actors.mask)),
                agent_idx=ag(pack.agent_idx + sid * a_loc),
                scen_mask=ag(pack.scen_mask),
            )
            losses = loss_fn(out_full, union, config.loss)
            m = dict(losses)
            m.update(metrics_fn(out_full, union))
            return losses["loss"], m

        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(params)
        # pmean (not psum) over "graph": the loss is recomputed identically
        # on every graph shard and all_gather's VJP SUMS those G identical
        # cotangents, so each shard's local gradient already carries a
        # factor of G — the mean cancels it (graph_parallel.py docstring).
        return _finish_step(tx, lr_fn, guard, params, opt_state, metrics, grads, epoch)

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data", "graph"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0, 1))
