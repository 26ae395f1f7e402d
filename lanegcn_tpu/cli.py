"""Command-line drivers: train / eval / preprocess.

Framework equivalents of the reference's train.py, test.py and
preprocess_data.py CLIs, on the packed-batch pipeline. Examples:

    python -m lanegcn_tpu.cli train --model lanegcn --data synthetic:256 \
        --epochs 2 --save-dir results/lanegcn
    python -m lanegcn_tpu.cli eval --model lanegcn --data synthetic:64 \
        --weight results/lanegcn/10.000.ckpt
    python -m lanegcn_tpu.cli preprocess --data synthetic:512 --out shards/
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np


def _parse_data(spec: str, model: str = "lanegcn"):
    """'synthetic:N[:corridors:actors]' / 'urban:N[:corridors:actors]'
    (junction-rich graphs) or a shard directory path."""
    from lanegcn_tpu.data.dataset import (
        RoiSyntheticDataset,
        ShardDataset,
        SyntheticDataset,
    )

    if spec.startswith(("synthetic", "urban")):
        parts = spec.split(":")
        n = int(parts[1]) if len(parts) > 1 else 256
        cor = int(parts[2]) if len(parts) > 2 else 3
        act = int(parts[3]) if len(parts) > 3 else 12
        cls = RoiSyntheticDataset if model == "lanercnn" else SyntheticDataset
        return cls(n, num_corridors=cor, num_actors=act, urban=spec.startswith("urban"))
    return ShardDataset(spec)


def _make_loader(dataset, config, model: str, **kw):
    """Model-family-aware loader: LaneRCNN uses the RoI packer. A `packer`
    in kw (e.g. the explicit graph-parallel pack+partition) wins."""
    from lanegcn_tpu.data.dataset import PackedLoader

    if model == "lanercnn":
        from lanegcn_tpu.data.packing_roi import pack_roi_batch

        kw.setdefault(
            "packer",
            lambda scens, cfg: pack_roi_batch(scens, cfg.roi_pack, cfg.model),
        )
        kw.setdefault("scen_per_pack", config.roi_pack.max_scenarios)
        return PackedLoader(dataset, config, **kw)
    return PackedLoader(dataset, config, **kw)


def _default_config(args):
    from lanegcn_tpu.config import Config, PackConfig, RoiPackConfig, TrainConfig

    b = args.batch_size
    pack = PackConfig(
        max_scenarios=b,
        max_actors=16 * b,
        max_nodes=768 * b,
        max_edges_scale0=832 * b,
        max_edges_dilated=1024 * b,
        max_edges_lr=256 * b,
        max_a2m_edges=1024 * b,
        max_m2a_edges=1024 * b,
        max_a2a_edges=384 * b,
    )
    roi_pack = RoiPackConfig(
        max_scenarios=b,
        max_rois=14 * b,
        max_roi_nodes=1280 * b,
        max_interest_nodes=224 * b,
        max_edges_scale0=1664 * b,
        max_edges_dilated=2048 * b,
        max_edges_lr=1664 * b,
        max_a2m_edges=448 * b,
        max_pool_edges=13312 * b,
        max_a2r_edges=896 * b,
    )
    return Config(pack=pack, roi_pack=roi_pack, train=TrainConfig(batch_size=b))


def _snapshot_run(save_dir: str, args, config) -> None:
    """Provenance snapshot into save_dir/files: the package source plus the
    resolved config / argv / library versions (framework equivalent of the
    reference copying its *.py into save_dir, train.py:108-115)."""
    import dataclasses
    import json
    import shutil
    import subprocess

    import jax

    files_dir = os.path.join(save_dir, "files")
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    dst = os.path.join(files_dir, "lanegcn_tpu")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(pkg_root, dst, ignore=shutil.ignore_patterns("__pycache__", "*.so"))
    rev = None
    try:
        rev = subprocess.check_output(
            ["git", "-C", os.path.dirname(pkg_root), "rev-parse", "HEAD"],
            stderr=subprocess.DEVNULL, text=True,
        ).strip()
    except Exception:
        pass
    with open(os.path.join(files_dir, "run.json"), "w") as f:
        json.dump(
            {
                "argv": sys.argv,
                "config": dataclasses.asdict(config),
                "git_rev": rev,
                "jax": jax.__version__,
            },
            f, indent=2, default=str,
        )


def _parse_mesh(spec):
    """'4' → (4, 1) data mesh; '4x2' → (data=4, graph=2)."""
    parts = str(spec).lower().split("x")
    data = int(parts[0])
    graph = int(parts[1]) if len(parts) > 1 else 1
    return data, graph


def _setup_runtime(args):
    """Platform override + multi-host init, before any jax device use."""
    import jax

    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    from lanegcn_tpu.parallel.multihost import initialize_distributed

    if getattr(args, "dist_nproc", None) or getattr(args, "dist_coordinator", None):
        initialize_distributed(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_nproc,
            process_id=args.dist_procid,
        )
    return jax.process_index(), jax.process_count()


def cmd_train(args):
    import dataclasses

    pi, pc = _setup_runtime(args)

    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.parallel.multihost import process_seed
    from lanegcn_tpu.train.checkpoint import load_checkpoint, load_pretrain, save_checkpoint
    from lanegcn_tpu.train.loop import MetricAccumulator, make_eval_step, make_train_step
    from lanegcn_tpu.train.optimizer import make_optimizer
    from lanegcn_tpu.train.preempt import PreemptionGuard
    from lanegcn_tpu.utils.logger import TeeLogger

    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        log_name = "log" if pi == 0 else f"log.{pi}"
        sys.stdout = TeeLogger(os.path.join(args.save_dir, log_name))

    config = _default_config(args)
    bundle = get_model(args.model, config)
    config = bundle.config  # model factories may adjust (e.g. AdamW)
    if args.seed is not None:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, seed=args.seed)
        )
    if args.save_dir and pi == 0:
        _snapshot_run(args.save_dir, args, config)
    dataset = _parse_data(args.data, args.model)
    if args.rot_aug:
        from lanegcn_tpu.data.augment import RotationAugment

        # Augmentation RNG differs per host (reference per-rank seeding,
        # train.py:55-59); the *shuffle* seed stays shared so the strided
        # process shards below are disjoint.
        dataset = RotationAugment(dataset, seed=process_seed(config.train.seed))
    # Explicit graph-parallel (--mesh DxG, G>1): the measured path
    # (tools/collective_audit.py — GSPMD infers ~25x more collectives /
    # ~17x more bytes for this program). It consumes FLAT packs; the
    # band/table/Pallas fusions stay the single-chip fast path.
    graph_n_req = _parse_mesh(args.mesh)[1] if args.mesh else 1
    gp_mode = getattr(args, "graph_parallel", "windowed")
    explicit_gp = (
        graph_n_req > 1
        and args.model in ("lanegcn", "lanercnn")
        and gp_mode == "explicit"
    )
    windowed_gp = (
        graph_n_req > 1
        and args.model in ("lanegcn", "lanercnn")
        and gp_mode == "windowed"
    )
    loader_kw = {}
    if windowed_gp:
        # Scenario-aligned graph shards: each loader group of S scenarios
        # packs into G sub-packs of S/G at 1/G capacities; every shard then
        # runs the UNMODIFIED fast path (parallel/windowed_parallel.py).
        from lanegcn_tpu.parallel.windowed_parallel import (
            subdivide_pack_config,
            subdivide_roi_pack_config,
        )

        if args.model == "lanercnn":
            from lanegcn_tpu.data.packing_roi import pack_roi_batch

            _sub_cfg = subdivide_roi_pack_config(config.roi_pack, graph_n_req)
            _pack_batch = lambda scens, sub, mcfg: pack_roi_batch(scens, sub, mcfg)
        else:
            from lanegcn_tpu.data.packing import pack_batch as _pb

            _sub_cfg = subdivide_pack_config(config.pack, graph_n_req)
            _pack_batch = lambda scens, sub, mcfg: _pb(scens, sub, mcfg)

        def _pack_windowed(scens, cfg):
            import numpy as _np

            from lanegcn_tpu.parallel.windowed_parallel import balance_scenarios

            # Greedy weight-balanced split (nodes+edges+actors per
            # scenario): at 1/G sub-capacities a positional split lets a
            # skewed draw overflow one shard's caps and drop edges
            # (tests/test_windowed_parallel.py::test_skewed_split_*).
            groups = balance_scenarios(
                scens, graph_n_req, max_per_group=_sub_cfg.max_scenarios
            )
            subs, merged = [], {}
            for g1 in range(graph_n_req):
                sb, st = _pack_batch(
                    [scens[i] for i in groups[g1]], _sub_cfg, cfg.model
                )
                subs.append(sb)
                for k, v in st.items():
                    if isinstance(v, (int, float)):
                        merged[k] = merged.get(k, 0) + v
            return jax.tree.map(lambda *x: _np.stack(x), *subs), merged

        loader_kw["packer"] = _pack_windowed
        if pc == 1:
            # Single-process mesh: the loader worker builds the FULL
            # [D, G, ...] step batch and transfers it mesh-sharded
            # (device_put_blob(sharding=...)), so host→device copies
            # overlap the in-flight step exactly like the single-device
            # path (round-5 VERDICT #5 — the old gating re-exposed the
            # relay's serialized main-thread transfers on `--mesh` runs).
            data_req = _parse_mesh(args.mesh)[0]
            spp = _sub_cfg.max_scenarios * graph_n_req

            def _pack_windowed_global(scens, cfg, _inner=_pack_windowed,
                                      _d=data_req, _spp=spp):
                import numpy as _np

                subs, merged = [], {}
                for d in range(_d):
                    sb, st = _inner(scens[d * _spp : (d + 1) * _spp], cfg)
                    subs.append(sb)
                    for k, v in st.items():
                        if isinstance(v, (int, float)):
                            merged[k] = merged.get(k, 0) + v
                return jax.tree.map(lambda *x: _np.stack(x), *subs), merged

            loader_kw["packer"] = _pack_windowed_global
            loader_kw["scen_per_pack"] = spp * data_req
    if explicit_gp:
        # Pack AND partition edges per pack inside the loader workers so the
        # step loop stays host-work-free (the pure-Python partition loop
        # would otherwise starve the device on the multi-chip path).
        if args.model == "lanercnn":
            from lanegcn_tpu.data.packing_roi import pack_roi_batch
            from lanegcn_tpu.parallel import partition_roi_pack_edges

            def _pack_and_partition(scens, cfg):
                batch, stats = pack_roi_batch(
                    scens, cfg.roi_pack, cfg.model,
                    split_bands=False, split_tables=False,
                )
                se = partition_roi_pack_edges(
                    batch, cfg, graph_n_req, slack=args.edge_shard_slack
                )
                stats["dropped_shard_edges"] = se.get("dropped_edges", 0)
                return (batch, se), stats

        else:
            from lanegcn_tpu.data.packing import pack_batch
            from lanegcn_tpu.parallel import partition_pack_edges

            def _pack_and_partition(scens, cfg):
                batch, stats = pack_batch(
                    scens, cfg.pack, cfg.model,
                    split_bands=False, split_tables=False,
                    scenario_plan=False,
                )
                se = partition_pack_edges(
                    batch, cfg, graph_n_req, slack=args.edge_shard_slack
                )
                stats["dropped_shard_edges"] = se.get("dropped_edges", 0)
                return (batch, se), stats

        loader_kw["packer"] = _pack_and_partition
    # Drop accounting (VERDICT r3 #4): every packer stats dict lands here;
    # the display loop below aggregates dropped_*/skipped_*/spilled_* into
    # the training log so capacity overflow is visible, not stdout-only.
    drop_stats: list = []
    # Worker-thread device transfers overlap the in-flight step. Three
    # cases: plain single-device put; single-process mesh runs get a
    # SHARDED blob put (the sharding cell is filled once the mesh exists
    # below — the loader only packs after that); multi-host paths assemble
    # global arrays from host numpy on the main thread.
    _transfer_cell: dict = {}
    if pc == 1 and not args.mesh:
        _to_device = True
    elif pc == 1 and windowed_gp:
        def _to_device(batch):
            from lanegcn_tpu.data.blob import device_put_blob

            return device_put_blob(batch, sharding=_transfer_cell.get("sharding"))
    else:
        _to_device = False
    loader = _make_loader(
        dataset, config, args.model,
        shuffle=True, seed=config.train.seed, pack_workers=args.workers,
        process_index=pi, process_count=pc, drop_stats=drop_stats,
        to_device=_to_device,
        **loader_kw,
    )

    if pc > 1 and not args.mesh:
        args.mesh = str(len(jax.devices()))  # pure DP over every chip
    mesh = None
    if args.mesh:
        from lanegcn_tpu.parallel import (
            graph_batch_shardings,
            make_mesh_2d,
            make_parallel_train_step,
            stack_packs,
        )

        data_n, graph_n = _parse_mesh(args.mesh)
        assert data_n % pc == 0, (
            f"data mesh axis {data_n} must be a multiple of process count {pc}"
        )
        mesh = make_mesh_2d(data=data_n, graph=graph_n)
        if explicit_gp and args.model == "lanercnn":
            rp = config.roi_pack
            n_glob = rp.max_global_nodes or rp.max_roi_nodes
            assert (
                rp.max_roi_nodes % graph_n == 0 and n_glob % graph_n == 0
            ), (
                f"RoI pack capacities (roi nodes {rp.max_roi_nodes}, global "
                f"nodes {n_glob}) must divide the graph axis {graph_n}"
            )
        elif windowed_gp:
            from lanegcn_tpu.parallel.windowed_parallel import (
                subdivide_pack_config,
                subdivide_roi_pack_config,
            )

            if args.model == "lanercnn":
                subdivide_roi_pack_config(config.roi_pack, graph_n)
            else:
                subdivide_pack_config(config.pack, graph_n)  # divisibility asserts
        elif explicit_gp:
            n_act = config.pack.max_actors * config.pack.max_scenarios
            assert config.pack.max_nodes % graph_n == 0 and n_act % graph_n == 0, (
                f"pack capacities (nodes {config.pack.max_nodes}, actors "
                f"{n_act}) must divide the graph axis {graph_n}"
            )
        if windowed_gp and pc == 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            _transfer_cell["sharding"] = NamedSharding(mesh, P("data", "graph"))
        if pi == 0:
            print(f"mesh: data={data_n} x graph={graph_n} on "
                  f"{[d.platform for d in mesh.devices.flat][0]}, "
                  f"{pc} process(es)"
                  + (", graph axis: windowed (scenario-aligned)" if windowed_gp
                     else (", graph axis: explicit shard_map" if explicit_gp
                           else (", graph axis: GSPMD" if graph_n > 1 else ""))))
    else:
        data_n = 1
    # One optimizer step consumes data_n packs globally; each process packs
    # its data_local share and assembles the rest via global arrays.
    data_local = data_n // pc
    if windowed_gp and pc == 1 and mesh is not None:
        # The loader worker already groups data_n packs per item and
        # transfers them mesh-sharded — one loader item per step.
        data_local = 1
    steps_per_epoch = max(loader.steps_per_epoch() // data_local, 1)
    state = {"first_pack": None, "shardings": None}

    def to_global(stacked):
        if state["shardings"] is None:
            if windowed_gp:
                from jax.sharding import NamedSharding, PartitionSpec as P

                state["shardings"] = jax.tree.map(
                    lambda _: NamedSharding(mesh, P("data", "graph")), stacked
                )
            elif explicit_gp:
                # shard_map in_specs: every batch leaf rides the data axis
                # whole; the graph axis lives in the partitioned edges.
                from jax.sharding import NamedSharding, PartitionSpec as P

                state["shardings"] = jax.tree.map(
                    lambda _: NamedSharding(mesh, P("data")), stacked
                )
            else:
                state["shardings"] = graph_batch_shardings(mesh, stacked)
        if pc == 1:
            return stacked
        return jax.tree.map(
            lambda sh, x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            state["shardings"], stacked,
        )

    def edges_global(se):
        from jax.sharding import NamedSharding, PartitionSpec as P

        if pc == 1:
            return se
        sh = NamedSharding(mesh, P("data", "graph"))
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), se
        )

    def global_batches(epoch_i):
        """Yield per-step batches: single packs, or stacked groups of
        data_local local packs assembled into a global [data_n, ...] batch
        (+ source-partitioned edge shards on the explicit graph path)."""
        group = []
        for b in loader.epoch(epoch_i):
            if mesh is None:
                if state["first_pack"] is None:
                    state["first_pack"] = b
                yield jax.tree.map(jnp.asarray, b)
                continue
            if windowed_gp and pc == 1:
                # Full [D, G, ...] batch, already sharded by the worker.
                if state["first_pack"] is None:
                    state["first_pack"] = jax.tree.map(lambda x: x[0, 0], b)
                yield b
                continue
            group.append(b)
            if len(group) == data_local:
                if windowed_gp:
                    if state["first_pack"] is None:
                        state["first_pack"] = jax.tree.map(lambda x: x[0], group[0])
                    yield to_global(stack_packs(group))
                    group = []
                    continue
                if explicit_gp:
                    from lanegcn_tpu.parallel import stack_pack_edges

                    packs = [p for p, _ in group]
                    if state["first_pack"] is None:
                        state["first_pack"] = packs[0]
                    stacked = stack_packs(packs)
                    se = stack_pack_edges([s for _, s in group])
                    yield (to_global(stacked), edges_global(se))
                else:
                    if state["first_pack"] is None:
                        state["first_pack"] = group[0]
                    yield to_global(stack_packs(group))
                group = []

    sample = None
    for b in global_batches(0):
        sample = b
        break
    init_sample = (
        jax.tree.map(jnp.asarray, state["first_pack"]) if mesh is not None else sample
    )
    net = bundle.net
    if args.bf16:
        net = dataclasses.replace(net, dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(config.train.seed), init_sample)["params"]
    tx, lr_fn = make_optimizer(config.train)
    opt_state = tx.init(params)
    start_epoch = 0.0

    if args.resume:
        ck = load_checkpoint(args.resume)
        params = load_pretrain(params, ck["params"])
        opt_state = ck["opt_state"]
        start_epoch = ck["epoch"]
        print(f"resumed from {args.resume} at epoch {start_epoch:.3f}")

    if mesh is None:
        train_step = make_train_step(
            config, net, tx, lr_fn, bundle.loss_fn, bundle.metrics_fn
        )
    elif windowed_gp:
        from lanegcn_tpu.parallel.windowed_parallel import (
            make_windowed_parallel_roi_train_step,
            make_windowed_parallel_train_step,
        )

        if args.model == "lanercnn":
            train_step = make_windowed_parallel_roi_train_step(
                config, net, tx, lr_fn, mesh, bundle.loss_fn, bundle.metrics_fn
            )
        else:
            train_step = make_windowed_parallel_train_step(
                config, tx, lr_fn, mesh, bundle.loss_fn, bundle.metrics_fn,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            )
    elif explicit_gp:
        from lanegcn_tpu.parallel import (
            make_explicit_parallel_roi_train_step,
            make_explicit_parallel_train_step,
        )

        make_ex = (
            make_explicit_parallel_roi_train_step
            if args.model == "lanercnn"
            else make_explicit_parallel_train_step
        )
        _raw_step = make_ex(
            config, tx, lr_fn, mesh, bundle.loss_fn, bundle.metrics_fn
        )
        train_step = lambda p, o, b, e: _raw_step(p, o, b[0], b[1], e)
    else:
        train_step = make_parallel_train_step(
            config, net, tx, lr_fn, mesh, bundle.loss_fn, bundle.metrics_fn,
            batch_shardings=state["shardings"],
        )
    eval_step = make_eval_step(config, net, bundle.loss_fn, bundle.metrics_fn)
    val_dataset = _parse_data(args.val_data, args.model) if args.val_data else None
    acc = MetricAccumulator()
    step = int(start_epoch * steps_per_epoch)
    save_freq = args.save_freq if args.save_freq is not None else config.train.save_freq
    next_save = (int(start_epoch / save_freq) + 1) * save_freq if save_freq else None
    next_val = (
        (int(start_epoch / args.val_every) + 1) * args.val_every
        if (args.val_every and val_dataset is not None) else None
    )
    t0 = time.time()
    num_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    if pi == 0:
        print(f"model {args.model}: {num_params:,} params, "
              f"{steps_per_epoch} steps/epoch on {jax.devices()[0].platform}")
    profiling = False
    last_val_step = -1

    with PreemptionGuard() as guard:
        for epoch_i in range(int(start_epoch), args.epochs):
            for batch in global_batches(epoch_i):
                if args.profile and step == 5:
                    jax.profiler.start_trace(args.profile)
                    profiling = True
                epoch = step / steps_per_epoch
                params, opt_state, metrics = train_step(params, opt_state, batch, epoch)
                acc.update(metrics)
                step += 1
                if profiling and step >= 10:
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"wrote profiler trace to {args.profile}")
                if step % args.display_every == 0:
                    # Under a mesh the metric sums come out of the jitted
                    # step already globally psum-reduced (replicated), so
                    # the summary is the cross-host total on every process
                    # — the XLA-native form of the reference's MPI
                    # allgather (train.py:245-255).
                    s = acc.summary()
                    # Aggregate packer drop counters accumulated since the
                    # last display (window-chunk drops, plan spill, shard
                    # overflow, capacity truncation) into the log line —
                    # a skewed real-map run degrades visibly, not silently.
                    drops: dict = {}
                    for ds_ in drop_stats:
                        for k, v in ds_.items():
                            if v and k.startswith(
                                ("dropped", "skipped", "spilled")
                            ):
                                drops[k] = drops.get(k, 0) + v
                    drop_stats.clear()
                    if pi == 0:
                        print(
                            f"epoch {epoch:.3f} lr {float(metrics['lr']):.5f} "
                            f"loss {s['loss']:.4f} {s['cls']:.4f} {s['reg']:.4f}, "
                            f"ade1 {s['ade1']:.4f}, fde1 {s['fde1']:.4f}, "
                            f"ade {s['ade']:.4f}, fde {s['fde']:.4f}, "
                            f"time {time.time() - t0:.2f}"
                            + (f", dropped {drops}" if drops else "")
                        )
                    acc.reset()
                    t0 = time.time()
                epoch_now = step / steps_per_epoch
                if guard.triggered:
                    # Preempted: write a resumable checkpoint and exit cleanly
                    # (the reference would just die; --resume continues here).
                    # Params are replicated, so rank 0's copy is the global
                    # state (reference rank-0 save, train.py:230-242).
                    if args.save_dir and pi == 0:
                        path = os.path.join(args.save_dir, "%3.3f.ckpt" % epoch_now)
                        save_checkpoint(path, params, opt_state, step, epoch_now)
                        print(f"{guard.signal_name}: saved {path}, exiting")
                    else:
                        print(f"{guard.signal_name}: exiting")
                    if profiling:
                        jax.profiler.stop_trace()
                    return
                if args.save_dir and pi == 0 and next_save is not None and epoch_now >= next_save:
                    path = os.path.join(args.save_dir, "%3.3f.ckpt" % epoch_now)
                    save_checkpoint(path, params, opt_state, step, epoch_now)
                    print(f"saved {path}")
                    next_save += save_freq
                elif next_save is not None and epoch_now >= next_save:
                    next_save += save_freq
                if next_val is not None and epoch_now >= next_val:
                    _run_eval(config, bundle, params, val_dataset, eval_step)
                    last_val_step = step
                    next_val += args.val_every
    if profiling:
        jax.profiler.stop_trace()

    if val_dataset is not None and last_val_step != step:
        _run_eval(config, bundle, params, val_dataset, eval_step)


def _run_eval(config, bundle, params, dataset, eval_step=None, submission=None):
    """Validation/inference over every scenario of `dataset`.

    Multi-host: each process evaluates a disjoint strided shard and the
    per-sequence metric sums reduce across hosts (reference MPI allgather,
    train.py:245-255). Scenarios a pack skips for capacity are counted and
    reported — the reference evaluates every scenario (test.py:82-90), so a
    nonzero drop count here flags an undersized eval PackConfig.
    """
    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.eval import forecasting_metric_sums, metrics_from_sums
    from lanegcn_tpu.parallel.multihost import sync_metric_sums
    from lanegcn_tpu.train.loop import make_eval_step

    pi, pc = jax.process_index(), jax.process_count()
    if pc > 1:
        # Evaluate on local devices only: pull the replicated params to host
        # so the plain-jit eval step never mixes global and local arrays.
        params = jax.tree.map(np.asarray, params)
    if eval_step is None:
        eval_step = make_eval_step(config, bundle.net, bundle.loss_fn, bundle.metrics_fn)
    drop_stats: list = []
    loader = _make_loader(
        dataset, config, bundle.name, shuffle=False,
        process_index=pi, process_count=pc, drop_stats=drop_stats,
    )
    preds, gts, probs, seq_ids = [], [], [], []
    t0 = time.time()
    for b in loader.epoch(0):
        batch = jax.tree.map(jnp.asarray, b)
        out, _ = eval_step(params, batch)
        p, g, pr = bundle.extract_fn(out, batch)
        preds.append(p)
        gts.append(g)
        probs.append(pr)
    k, t = config.model.num_mods, config.model.num_preds
    preds = np.concatenate(preds, 0) if preds else np.zeros((0, k, t, 2), np.float32)
    gts = np.concatenate(gts, 0) if gts else np.zeros((0, t, 2), np.float32)
    probs = np.concatenate(probs, 0) if probs else np.zeros((0, k), np.float32)
    seq_ids = np.concatenate(
        [np.asarray(s["seq_ids"], np.int64) for s in drop_stats]
    ) if drop_stats else np.zeros(0, np.int64)
    dropped = sum(s.get("skipped_scenarios", 0) for s in drop_stats)
    if submission:
        from lanegcn_tpu.eval import write_submission

        path = submission if pc == 1 else f"{submission}.part{pi}"
        write_submission(path, preds, seq_ids, probabilities=probs)
        print(f"wrote submission to {path}")
    sums = forecasting_metric_sums(preds, gts)
    sums["dropped"] = float(dropped)
    sums = sync_metric_sums(sums)
    metrics = metrics_from_sums({k_: v for k_, v in sums.items() if k_ != "dropped"})
    if pi == 0:
        print(
            f"validation: {int(sums['count'])} scenarios in {time.time() - t0:.1f}s"
            + (f" (WARNING: {int(sums['dropped'])} dropped over pack capacity)"
               if sums["dropped"] else "")
        )
        for k_, v in metrics.items():
            print(f"  {k_}: {v:.4f}")
    return metrics


def cmd_eval(args):
    _setup_runtime(args)

    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.models.registry import get_model
    from lanegcn_tpu.train.checkpoint import load_checkpoint, load_pretrain

    config = _default_config(args)
    bundle = get_model(args.model, config)
    config = bundle.config
    dataset = _parse_data(args.data, args.model)

    loader = _make_loader(dataset, config, args.model, shuffle=False)
    sample = None
    for b in loader.epoch(0):
        sample = jax.tree.map(jnp.asarray, b)
        break
    params = bundle.net.init(jax.random.PRNGKey(0), sample)["params"]
    if args.torch_weight:
        # Reference checkpoint (e.g. the published 36.000.ckpt,
        # reference README.MD:88): map the torch state_dict onto our
        # param tree (utils/torch_import.py name/layout table).
        from lanegcn_tpu.utils.torch_import import load_torch_checkpoint

        params = jax.tree.map(
            jnp.asarray,
            load_torch_checkpoint(args.torch_weight, config.model, args.model),
        )
        print(f"imported torch checkpoint {args.torch_weight}")
    elif args.weight:
        ck = load_checkpoint(args.weight)
        params = load_pretrain(params, ck["params"])
        print(f"loaded {args.weight}")
    _run_eval(config, bundle, params, dataset, submission=args.submission)


def cmd_preprocess(args):
    """Featurize + graph-build scenarios offline into pickle shards.

    Bakes the pack-ready blobs (precompute_pack_cache) into each scenario so
    training-time packing is pure concatenation."""
    from lanegcn_tpu.config import ModelConfig
    from lanegcn_tpu.data.packing import precompute_pack_cache

    dataset = _parse_data(args.data, getattr(args, "model", "lanegcn"))
    model_cfg = ModelConfig()
    os.makedirs(args.out, exist_ok=True)
    shard, shard_id, per_shard = [], 0, args.shard_size
    t0 = time.time()
    for i in range(len(dataset)):
        scen = dataset[i]
        if "graph" in scen:
            precompute_pack_cache(scen, model_cfg)
        if "subgraphs" in scen:
            from lanegcn_tpu.data.packing_roi import precompute_roi_cache

            precompute_roi_cache(scen, model_cfg)
        shard.append(scen)
        if len(shard) == per_shard:
            path = os.path.join(args.out, f"shard_{shard_id:05d}.pkl")
            with open(path, "wb") as f:
                pickle.dump(shard, f, protocol=pickle.HIGHEST_PROTOCOL)
            shard, shard_id = [], shard_id + 1
            print(f"{i + 1}/{len(dataset)} scenarios ({time.time() - t0:.1f}s)")
    if shard:
        with open(os.path.join(args.out, f"shard_{shard_id:05d}.pkl"), "wb") as f:
            pickle.dump(shard, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"wrote {shard_id + 1} shards to {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lanegcn_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--model", default="lanegcn")
    pt.add_argument("--data", default="synthetic:256")
    pt.add_argument("--val-data", default=None)
    pt.add_argument("--epochs", type=int, default=2)
    pt.add_argument("--batch-size", type=int, default=8)
    pt.add_argument("--save-dir", default=None)
    pt.add_argument("--resume", default=None)
    pt.add_argument("--display-every", type=int, default=10)
    pt.add_argument("--rot-aug", action="store_true",
                    help="random rotation augmentation (reference rot_aug)")
    pt.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (fp32 params/normalization)")
    pt.add_argument("--seed", type=int, default=None,
                    help="training seed (reference per-rank seeding)")
    pt.add_argument("--save-freq", type=float, default=None,
                    help="checkpoint every N (fractional) epochs "
                         "(reference save_freq)")
    pt.add_argument("--val-every", type=float, default=0.0,
                    help="run validation every N (fractional) epochs "
                         "(reference val_iters)")
    pt.add_argument("--workers", type=int, default=1,
                    help="background packing threads (PackedLoader)")
    pt.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of steps 5-10 to DIR")
    pt.add_argument("--edge-shard-slack", type=float, default=2.0,
                    help="per-shard edge-capacity slack for the explicit "
                         "graph-parallel partition (overflow edges beyond "
                         "cap are dropped with a warning)")
    pt.add_argument("--graph-parallel", choices=["windowed", "explicit", "gspmd"],
                    default="windowed",
                    help="graph-axis strategy for --mesh DxG (G>1): windowed = "
                         "scenario-aligned shards running the full single-chip "
                         "fast path per shard (13 collectives/step, the "
                         "production default for both models), explicit = "
                         "source-partitioned shard_map kernels (for graphs "
                         "bigger than one shard), gspmd = XLA-inferred "
                         "(tools/collective_audit.py has the measured "
                         "comparison)")
    pt.add_argument("--mesh", default=None, metavar="DxG",
                    help="device mesh, e.g. 4 (data) or 4x2 (data x graph); "
                         "default single-device (multi-process: all devices)")
    pt.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before device init")
    pt.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator for manual multi-host "
                         "setups (TPU pods auto-discover without flags)")
    pt.add_argument("--dist-nproc", type=int, default=None,
                    help="total process count for manual multi-host setups")
    pt.add_argument("--dist-procid", type=int, default=None,
                    help="this process's id for manual multi-host setups")
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval")
    pe.add_argument("--model", default="lanegcn")
    pe.add_argument("--data", default="synthetic:64")
    pe.add_argument("--weight", default=None)
    pe.add_argument("--torch-weight", default=None,
                    help="import a reference torch checkpoint "
                         "(state_dict ckpt, e.g. 36.000.ckpt)")
    pe.add_argument("--batch-size", type=int, default=8)
    pe.add_argument("--submission", default=None,
                    help="write a competition submission file (h5/npz)")
    pe.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before device init")
    pe.set_defaults(fn=cmd_eval)

    pp = sub.add_parser("preprocess")
    pp.add_argument("--model", default="lanegcn")
    pp.add_argument("--data", default="synthetic:512")
    pp.add_argument("--out", required=True)
    pp.add_argument("--shard-size", type=int, default=128)
    pp.set_defaults(fn=cmd_preprocess)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
