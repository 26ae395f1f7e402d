"""Tests for forecasting metrics and the packed loader."""

import numpy as np
import pytest

from lanegcn_tpu.config import Config, PackConfig
from lanegcn_tpu.data.dataset import PackedLoader, SyntheticDataset
from lanegcn_tpu.eval import evaluate_predictions, forecasting_metrics


def test_metrics_perfect_prediction():
    rng = np.random.default_rng(0)
    gts = rng.normal(size=(5, 30, 2))
    preds = np.repeat(gts[:, None], 6, axis=1)
    m = forecasting_metrics(preds, gts, k=6)
    assert m["minADE_6"] == 0.0 and m["minFDE_6"] == 0.0 and m["MR_6"] == 0.0


def test_metrics_min_over_modes():
    gts = np.zeros((1, 30, 2))
    preds = np.zeros((1, 6, 30, 2))
    preds[:, :5] += 100.0  # modes 0-4 terrible, mode 5 perfect
    m = forecasting_metrics(preds, gts, k=6)
    assert m["minADE_6"] == 0.0
    m1 = forecasting_metrics(preds, gts, k=1)  # only mode 0 → miss
    assert m1["MR_1"] == 1.0
    assert m1["minFDE_1"] > 2.0


def test_metrics_miss_rate_threshold():
    gts = np.zeros((2, 30, 2))
    preds = np.zeros((2, 6, 30, 2))
    preds[0, :, -1, 0] = 1.9  # final-step error 1.9 < 2 → hit
    preds[1, :, -1, 0] = 2.1  # miss
    m = forecasting_metrics(preds, gts, k=6)
    assert m["MR_6"] == 0.5
    full = evaluate_predictions(preds, gts)
    assert set(full) == {"minADE_6", "minFDE_6", "MR_6", "minADE_1", "minFDE_1", "MR_1"}


def test_packed_loader_covers_dataset():
    cfg = Config(pack=PackConfig(
        max_scenarios=3, max_actors=96, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=2048,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=4096,
    ))
    ds = SyntheticDataset(7, num_corridors=1, num_actors=4)
    stats = []
    loader = PackedLoader(ds, cfg, shuffle=True, seed=1, drop_stats=stats)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 3  # ceil(7/3)
    total = sum(s["packed_scenarios"] for s in stats)
    assert total + sum(s["skipped_scenarios"] for s in stats) == 7


def test_packed_loader_process_sharding():
    cfg = Config(pack=PackConfig(max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=2048,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=4096))
    ds = SyntheticDataset(8, num_corridors=1, num_actors=4)
    seen = []
    for rank in range(2):
        loader = PackedLoader(ds, cfg, shuffle=True, seed=3,
                              process_index=rank, process_count=2)
        seen.append(set(loader._epoch_order(0).tolist()))
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(8))


def test_step_lr_matches_reference_semantics():
    """Piecewise-constant lr by fractional epoch (reference utils.py:165-177)."""
    import jax.numpy as jnp

    from lanegcn_tpu.train.optimizer import step_lr

    lr_fn = step_lr([1e-3, 1e-4], [32.0])
    assert float(lr_fn(0.0)) == pytest.approx(1e-3)
    assert float(lr_fn(31.999)) == pytest.approx(1e-3)
    assert float(lr_fn(32.0)) == pytest.approx(1e-4)
    assert float(lr_fn(35.5)) == pytest.approx(1e-4)
    # Multiple boundaries.
    lr3 = step_lr([1.0, 0.1, 0.01], [2.0, 4.0])
    assert float(lr3(1.0)) == pytest.approx(1.0)
    assert float(lr3(3.0)) == pytest.approx(0.1)
    assert float(lr3(4.0)) == pytest.approx(0.01)
    # Traced scalar input works.
    import jax

    assert float(jax.jit(lr_fn)(jnp.float32(33.0))) == pytest.approx(1e-4)


def test_packed_loader_thread_pool_matches_single():
    cfg = Config(pack=PackConfig(max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=2048,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=4096))
    ds = SyntheticDataset(6, num_corridors=1, num_actors=4)
    b1 = list(PackedLoader(ds, cfg, shuffle=True, seed=9).epoch(0))
    b2 = list(PackedLoader(ds, cfg, shuffle=True, seed=9, pack_workers=3).epoch(0))
    assert len(b1) == len(b2) == 3
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a.actors.feats, b.actors.feats)
        np.testing.assert_array_equal(a.graph.ctrs, b.graph.ctrs)


def test_preprocess_shard_train_roundtrip(tmp_path):
    """Offline preprocess → pickle shards → ShardDataset → packed training
    batch (the real-data flow, reference preprocess_data.py → ArgoDataset)."""
    from lanegcn_tpu.cli import main as cli_main
    from lanegcn_tpu.data.dataset import ShardDataset

    out = str(tmp_path / "shards")
    cli_main(["preprocess", "--data", "synthetic:5:1:4", "--out", out,
              "--shard-size", "2"])
    ds = ShardDataset(out)
    assert len(ds) == 5
    scen = ds[3]
    assert scen["feats"].shape[1:] == (20, 3)
    assert scen["graph"]["num_nodes"] > 0

    cfg = Config(pack=PackConfig(max_scenarios=2, max_actors=64, max_nodes=4096,
        max_edges_scale0=8192, max_edges_dilated=8192, max_edges_lr=2048,
        max_a2m_edges=8192, max_m2a_edges=8192, max_a2a_edges=4096))
    loader = PackedLoader(ds, cfg, shuffle=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0].actors.mask.any()


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from lanegcn_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    params = {"w": jnp.arange(8.0), "b": {"x": jnp.ones((2, 3))}}
    opt = {"m": jnp.zeros(8)}
    path = str(tmp_path / "ck")
    save_checkpoint_orbax(path, params, opt, step=7, epoch=1.5)
    template = {
        "params": jax.tree.map(jnp.zeros_like, params),
        "opt_state": jax.tree.map(jnp.zeros_like, opt),
        "meta": {"step": 0, "epoch": 0.0},
    }
    restored = load_checkpoint_orbax(path, template)
    assert restored["meta"]["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]["x"]), np.ones((2, 3)))


def test_submission_plumbs_seq_ids_and_probs(tmp_path):
    """CLI eval writes real scenario seq_ids and softmax(cls) probabilities
    into the submission file (reference test.py:110-113 via argo_id/city,
    data.py:364-434) — not arange ids and uniform probs."""
    import sys

    import numpy as np

    from lanegcn_tpu.cli import main

    sub = str(tmp_path / "sub")
    main([
        "eval", "--model", "lanegcn", "--data", "synthetic:4:1:4",
        "--batch-size", "2", "--submission", sub,
    ])
    import os

    if os.path.exists(sub + ".h5"):
        import h5py

        with h5py.File(sub + ".h5") as f:
            data = np.asarray(f["argoverse_forecasting"])  # [B*K*T, 5]
    else:
        data = np.load(sub + ".npz")["argoverse_forecasting"]
    k, t = 6, 30
    ids = data[:, 0].reshape(-1, k * t)[:, 0].astype(int)
    # synthetic seq_id == generator seed == dataset index
    assert sorted(ids.tolist()) == [0, 1, 2, 3], ids
    probs = data[:, 4].reshape(-1, k, t)[:, :, 0]
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    # mode confidences are sorted descending (PredNet sorts), so probs too
    assert np.all(np.diff(probs, axis=1) <= 1e-6)


def test_windowed_shard_shuffle_no_thrash(tmp_path):
    """Shuffled epochs over a ShardDataset visit every scenario exactly once
    while unpickling each shard at most once per epoch (windowed shard-aware
    shuffle — the scalable counterpart of the reference loading the whole
    split into RAM, data.py:21-25)."""
    import pickle

    import numpy as np

    from lanegcn_tpu.data.dataset import PackedLoader, ShardDataset

    # 6 shards x 4 tiny scenario stubs; the "scenario" only needs identity
    # here, so bypass the packer with a passthrough.
    for s in range(6):
        shard = [{"seq_id": s * 4 + i} for i in range(4)]
        with open(tmp_path / f"shard_{s:05d}.pkl", "wb") as f:
            pickle.dump(shard, f)
    ds = ShardDataset(str(tmp_path), cache_shards=3)
    assert ds.shard_spans == [(i * 4, i * 4 + 4) for i in range(6)]
    base_loads = ds.load_count
    assert base_loads == 6  # index build

    from lanegcn_tpu.config import Config

    loader = PackedLoader(
        ds, Config(), shuffle=True, seed=5, scen_per_pack=4,
        packer=lambda scens, cfg: ([s["seq_id"] for s in scens], {}),
    )
    seen = []
    for batch in loader.epoch(0):
        seen += batch
    assert sorted(seen) == list(range(24))
    # each shard unpickled at most once during the epoch
    assert ds.load_count - base_loads <= 6, ds.load_count
    # the order is actually shuffled (not identity) and differs across epochs
    seen2 = [x for b in loader.epoch(1) for x in b]
    assert seen != list(range(24)) and seen2 != seen
    assert sorted(seen2) == list(range(24))


def test_windowed_shuffle_process_shards_disjoint(tmp_path):
    import pickle

    from lanegcn_tpu.config import Config
    from lanegcn_tpu.data.dataset import PackedLoader, ShardDataset

    for s in range(4):
        with open(tmp_path / f"shard_{s:05d}.pkl", "wb") as f:
            pickle.dump([{"seq_id": s * 4 + i} for i in range(4)], f)
    ds = ShardDataset(str(tmp_path))
    orders = [
        PackedLoader(ds, Config(), shuffle=True, seed=9,
                     process_index=p, process_count=2)._epoch_order(3)
        for p in (0, 1)
    ]
    both = np.concatenate(orders)
    assert len(set(both.tolist())) == 16
