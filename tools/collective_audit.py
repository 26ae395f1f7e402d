"""Collective audit: GSPMD 2-D mesh vs explicit shard_map graph kernels.

VERDICT #7 asks for a measured decision on the graph-parallel path: either
the explicit edge-partitioned kernels (parallel/graph_shard.py) beat what
GSPMD infers for the production 2-D (data × graph) mesh, or GSPMD is the
strategy and the explicit kernels are documentation. A virtual CPU mesh
can't time ICI, but the compiled HLO tells us exactly which collectives XLA
inserted and how many bytes they move — that's the part the explicit
kernels control.

Usage:  python tools/collective_audit.py            # 8 virtual devices

Prints per-program collective op counts and total collective bytes for:
  1. the full GSPMD train step on a (data=2, graph=2) mesh
     (make_parallel_train_step + graph_batch_shardings),
  2. the same train step on a pure-data (data=4) mesh (baseline: gradient
     psum only),
  3. the explicit shard_map LaneConv stack fwd+bwd on a graph=4 mesh,
  4. the explicit shard_map Att layer fwd+bwd on a graph=4 mesh.
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lanegcn_tpu.config import Config, PackConfig, relation_names
from lanegcn_tpu.data import make_synthetic_scenario, pack_batch
from lanegcn_tpu.models.lanegcn import LaneGCN
from lanegcn_tpu.parallel import (
    graph_batch_shardings,
    make_mesh,
    make_mesh_2d,
    make_parallel_train_step,
    stack_packs,
)
from lanegcn_tpu.parallel.graph_shard import (
    make_sharded_att,
    make_sharded_lane_conv,
    partition_edge_set_by_source,
    partition_edges_by_source,
)
from lanegcn_tpu.train.optimizer import make_optimizer

PACK = PackConfig(
    max_scenarios=2, max_actors=24, max_nodes=512,
    max_edges_scale0=768, max_edges_dilated=1024, max_edges_lr=256,
    max_a2m_edges=1024, max_m2a_edges=1024, max_a2a_edges=512,
)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1}

_COLL = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all")


def audit_hlo(text):
    """Count collective ops and estimate the bytes they move (output shapes)."""
    counts = Counter()
    bytes_total = 0
    for line in text.splitlines():
        m = re.search(r"=\s*((?:\([^)]*\)|[a-z0-9\[\],{}]+))\s*(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)", line)
        if not m:
            continue
        op = m.group(2)
        if "-start" in line or "-done" in line:
            # async pairs: count the start only (done repeats the shape)
            if "-done" in line:
                continue
        counts[op] += 1
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_total += n * _DTYPE_BYTES[dt]
    return counts, bytes_total


def report(name, compiled):
    text = compiled.as_text()
    counts, nbytes = audit_hlo(text)
    total = sum(counts.values())
    print(f"\n== {name}")
    print(f"   collectives: {total}  bytes_moved(total outputs): {nbytes/1e6:.3f} MB")
    for op, c in sorted(counts.items()):
        print(f"   {op:22s} x{c}")
    return counts, nbytes


def main():
    config = Config(pack=PACK)
    net = LaneGCN(config.model)
    tx, lr_fn = make_optimizer(config.train)

    def packs(n, seed0=0):
        out = []
        for d in range(n):
            scens = [
                make_synthetic_scenario(seed=seed0 + 10 * d + i, num_corridors=2, num_actors=5)
                for i in range(2)
            ]
            out.append(pack_batch(scens, config.pack, config.model)[0])
        return out

    batch2 = stack_packs(packs(2))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch2)
    params = net.init(jax.random.PRNGKey(0), sample)["params"]
    opt_state = tx.init(params)

    # 1. GSPMD (data=2, graph=2)
    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    sh = graph_batch_shardings(mesh2d, batch2)
    step2d = make_parallel_train_step(config, net, tx, lr_fn, mesh2d, batch_shardings=sh)
    c2d = step2d.lower(params, opt_state, batch2, 0.0).compile()
    g2d = report("GSPMD train step, mesh (data=2, graph=2)", c2d)

    # 2. pure data-parallel baseline (data=4): gradient psum only
    batch4 = stack_packs(packs(4, seed0=40))
    mesh1d = make_mesh(jax.devices()[:4])
    step1d = make_parallel_train_step(config, net, tx, lr_fn, mesh1d)
    c1d = step1d.lower(params, opt_state, batch4, 0.0).compile()
    g1d = report("GSPMD train step, mesh (data=4) [gradient psum only]", c1d)

    # 3. explicit LaneConv stack (graph=4), fwd+bwd
    from jax.sharding import Mesh

    gmesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    n_nodes = PACK.max_nodes
    names = relation_names(config.model.num_scales)
    gb = sample.graph
    edges = {nm: gb.edges[nm] for nm in names if nm in gb.edges}
    for nm in names:
        if nm not in edges:
            from lanegcn_tpu.graph import EdgeSet
            edges[nm] = EdgeSet(
                u=np.zeros(4, np.int32), v=np.zeros(4, np.int32), mask=np.zeros(4, bool)
            )
    sharded_edges = partition_edges_by_source(edges, n_nodes, 4)
    feat = np.random.default_rng(0).normal(size=(n_nodes, config.model.n_map)).astype(np.float32)
    stack_params = params["map_net"]["fuse"]
    conv_fn = make_sharded_lane_conv(config.model, gmesh, n_nodes)

    def conv_loss(p, f):
        return jnp.sum(conv_fn(p, f, sharded_edges) ** 2)

    conv_grad = jax.jit(jax.grad(conv_loss, argnums=(0, 1)))
    cconv = conv_grad.lower(stack_params, jnp.asarray(feat)).compile()
    gconv = report("explicit shard_map LaneConv stack (4 layers) fwd+bwd, graph=4", cconv)

    # 4. explicit Att layer (graph=4), fwd+bwd
    att_params = params["a2a"]["att0"]
    n_act = PACK.max_actors * PACK.max_scenarios
    a2a = sample.fusion.a2a
    sh_edges = partition_edge_set_by_source(a2a, n_act, 4)
    att_fn = make_sharded_att(gmesh, n_act)
    agts = np.random.default_rng(1).normal(size=(n_act, config.model.n_actor)).astype(np.float32)
    ctrs = np.random.default_rng(2).normal(size=(n_act, 2)).astype(np.float32)

    def att_loss(p, a):
        return jnp.sum(att_fn(p, a, jnp.asarray(ctrs), a, jnp.asarray(ctrs), sh_edges) ** 2)

    att_grad = jax.jit(jax.grad(att_loss, argnums=(0, 1)))
    catt = att_grad.lower(att_params, jnp.asarray(agts)).compile()
    gatt = report("explicit shard_map Att layer fwd+bwd, graph=4", catt)

    # Model-level extrapolation: a full LaneGCN step has 2 LaneConv stacks
    # (MapNet + M2M) and 8 Att applications (2 per fusion stage).
    exp_counts = Counter()
    exp_bytes = 2 * gconv[1] + 8 * gatt[1]
    for op, c in gconv[0].items():
        exp_counts[op] += 2 * c
    for op, c in gatt[0].items():
        exp_counts[op] += 8 * c
    print("\n== explicit path extrapolated to a full step (2 stacks + 8 Att)")
    print(f"   collectives: {sum(exp_counts.values())}  bytes: {exp_bytes/1e6:.3f} MB (+ gradient psum, same as data-mesh)")
    for op, c in sorted(exp_counts.items()):
        print(f"   {op:22s} x{c}")

    dgc = sum(g2d[0].values()) - sum(g1d[0].values())
    dgb = g2d[1] - g1d[1]
    print("\n== summary")
    print(f"   GSPMD graph-axis overhead vs pure DP: +{dgc} collectives, +{dgb/1e6:.3f} MB")
    print(f"   explicit kernels would spend:          {sum(exp_counts.values())} collectives, {exp_bytes/1e6:.3f} MB")

    # 5. FULL explicit LaneGCN train step (the shipped --mesh DxG program).
    from lanegcn_tpu.parallel import (
        make_explicit_parallel_train_step,
        partition_stacked_edges,
    )

    flat = stack_packs([
        pack_batch(
            [make_synthetic_scenario(seed=60 + 10 * d + i, num_corridors=2, num_actors=5)
             for i in range(2)],
            config.pack, config.model,
            split_bands=False, split_tables=False, scenario_plan=False,
        )[0]
        for d in range(2)
    ])
    se = jax.tree.map(jnp.asarray, partition_stacked_edges(flat, config, 2))
    fsample = jax.tree.map(lambda x: jnp.asarray(x[0]), flat)
    fparams = net.init(jax.random.PRNGKey(0), fsample)["params"]
    ex_step = make_explicit_parallel_train_step(config, tx, lr_fn, mesh2d)
    cex = ex_step.lower(
        fparams, tx.init(fparams), jax.tree.map(jnp.asarray, flat), se, 0.0
    ).compile()
    report("EXPLICIT full train step, mesh (data=2, graph=2) [shipped]", cex)

    # 6. WINDOWED (scenario-aligned) full train step: per-shard compute is
    # the unmodified single-chip fast path on sub-packs; the only
    # collectives are the output/loss-field all_gathers + the grad pmean.
    from lanegcn_tpu.parallel.windowed_parallel import (
        make_windowed_parallel_train_step,
        subdivide_pack_config,
    )

    sub_cfg = subdivide_pack_config(config.pack, 2)
    subs = []
    for d in range(2):
        row = [
            pack_batch(
                [make_synthetic_scenario(seed=60 + 10 * d + g1, num_corridors=2,
                                         num_actors=5)],
                sub_cfg, config.model,
            )[0]
            for g1 in range(2)
        ]
        subs.append(jax.tree.map(lambda *x: np.stack(x), *row))
    wbatch = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)), *subs)
    wsample = jax.tree.map(lambda x: x[0, 0], wbatch)
    wparams = net.init(jax.random.PRNGKey(0), wsample)["params"]
    w_step = make_windowed_parallel_train_step(config, tx, lr_fn, mesh2d)
    cw = w_step.lower(wparams, tx.init(wparams), wbatch, 0.0).compile()
    report("WINDOWED full train step, mesh (data=2, graph=2) [fast kernels/shard]", cw)


def lanercnn_audit():
    """Same comparison for LaneRCNN: GSPMD-inferred (data=2, graph=2) vs the
    explicit shard_map RoI step (reference distributed LaneRCNN training:
    train_lanercnn.py, train_lrcnn_torch.py:119-124)."""
    from lanegcn_tpu.config import RoiPackConfig
    from lanegcn_tpu.data.lane_roi import generate_lane_rois
    from lanegcn_tpu.data.packing_roi import pack_roi_batch
    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.parallel import (
        make_explicit_parallel_roi_train_step,
        partition_roi_pack_edges,
        stack_pack_edges,
    )

    roi_pack = RoiPackConfig(
        max_scenarios=2, max_rois=8, max_roi_nodes=768, max_interest_nodes=256,
        max_global_nodes=512, max_edges_scale0=512, max_edges_dilated=512,
        max_edges_lr=512, max_a2m_edges=256, max_pool_edges=2048,
        max_a2r_edges=512,
    )
    config = Config(roi_pack=roi_pack)
    bundle = get_model("lanercnn", config)
    config = bundle.config
    tx, lr_fn = make_optimizer(config.train)

    def roi_packs(split):
        out = []
        for d in range(2):
            scens = [
                generate_lane_rois(make_synthetic_scenario(
                    seed=300 + 10 * d + i, num_corridors=1, num_actors=4))
                for i in range(2)
            ]
            out.append(pack_roi_batch(
                scens, config.roi_pack, config.model,
                split_bands=split, split_tables=split,
            )[0])
        return out

    mesh2d = make_mesh_2d(jax.devices()[:4], data=2, graph=2)
    batch = stack_packs(roi_packs(True))
    sample = jax.tree.map(lambda x: jnp.asarray(x[0]), batch)
    params = bundle.net.init(jax.random.PRNGKey(2), sample)["params"]
    step = make_parallel_train_step(
        config, bundle.net, tx, lr_fn, mesh2d,
        loss_fn=bundle.loss_fn, metrics_fn=bundle.metrics_fn,
        batch_shardings=graph_batch_shardings(mesh2d, batch),
    )
    c = step.lower(params, tx.init(params), batch, 0.0).compile()
    g = report("LaneRCNN GSPMD train step, mesh (data=2, graph=2)", c)

    flat_packs = roi_packs(False)
    se = stack_pack_edges([partition_roi_pack_edges(p, config, 2) for p in flat_packs])
    se = jax.tree.map(jnp.asarray, se)
    flat = stack_packs(flat_packs)
    fparams = bundle.net.init(
        jax.random.PRNGKey(2), jax.tree.map(lambda x: jnp.asarray(x[0]), flat)
    )["params"]
    ex = make_explicit_parallel_roi_train_step(
        config, tx, lr_fn, mesh2d, bundle.loss_fn, bundle.metrics_fn
    )
    cex = ex.lower(
        fparams, tx.init(fparams), jax.tree.map(jnp.asarray, flat), se, 0.0
    ).compile()
    gex = report("LaneRCNN EXPLICIT train step, mesh (data=2, graph=2) [shipped]", cex)
    print("\n== lanercnn summary")
    print(f"   GSPMD:    {sum(g[0].values())} collectives, {g[1]/1e6:.3f} MB")
    print(f"   explicit: {sum(gex[0].values())} collectives, {gex[1]/1e6:.3f} MB")


if __name__ == "__main__":
    if "lanercnn" in sys.argv[1:]:
        lanercnn_audit()
    else:
        main()
