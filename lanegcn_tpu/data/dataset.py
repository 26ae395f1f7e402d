"""Datasets + packed-batch loader with background host-side packing.

Replaces the reference's DataLoader + giant-pickle flow (reference
data.py:16-105, preprocess_data.py:242-263) with:
- ShardDataset: per-scenario dicts from a directory of .pkl pickle shards
  (the preprocess CLI writes these) — or generated synthetically,
- PackedLoader: shuffles scenario order, packs fixed-capacity batches on a
  background thread so device steps never wait on host work.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from lanegcn_tpu.config import Config
from lanegcn_tpu.data.packing import pack_batch
from lanegcn_tpu.data.synthetic import make_synthetic_scenario


class SyntheticDataset:
    """Deterministic synthetic scenarios by index (tests, benches, demos).
    urban=True produces junction-rich (fork/merge/connector) graphs."""

    def __init__(
        self, size: int, num_corridors: int = 3, num_actors: int = 12,
        urban: bool = False,
    ):
        self.size = size
        self.num_corridors = num_corridors
        self.num_actors = num_actors
        self.urban = urban

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, idx: int) -> Dict:
        return make_synthetic_scenario(
            seed=idx, num_corridors=self.num_corridors,
            num_actors=self.num_actors, urban=self.urban,
        )


class RoiSyntheticDataset(SyntheticDataset):
    """Synthetic scenarios with per-agent LaneRoI subgraphs (LaneRCNN)."""

    def __getitem__(self, idx: int) -> Dict:
        from lanegcn_tpu.data.lane_roi import generate_lane_rois

        return generate_lane_rois(super().__getitem__(idx))


class ShardDataset:
    """Preprocessed scenarios stored as pickle shards (dir of .pkl files,
    each a list of scenario dicts — the preprocess CLI writes these).

    Keeps at most `cache_shards` unpickled shards in memory (LRU); random
    access outside the cached window costs one unpickle. PackedLoader's
    windowed shard-aware shuffle (see _epoch_order) keeps accesses inside
    the window, so a full-epoch shuffled pass unpickles each shard exactly
    once — the scalable replacement for the reference loading the entire
    205k-scenario split into RAM (reference data.py:21-25)."""

    def __init__(self, root: str, cache_shards: int = 3):
        self.paths = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".pkl")
        )
        self.cache_shards = cache_shards
        self._index: List[tuple] = []
        self._cache: Dict[str, list] = {}
        self.load_count = 0  # unpickle count (shard-thrash diagnostic)
        self.shard_spans: List[tuple] = []  # (start, end) global idx per shard
        for p in self.paths:
            shard = self._load(p)
            start = len(self._index)
            self._index += [(p, i) for i in range(len(shard))]
            self.shard_spans.append((start, len(self._index)))

    def _load(self, path: str) -> list:
        if path not in self._cache:
            self.load_count += 1
            if len(self._cache) >= max(self.cache_shards, 1):
                self._cache.pop(next(iter(self._cache)))
            with open(path, "rb") as f:
                self._cache[path] = pickle.load(f)
        else:  # LRU refresh
            self._cache[path] = self._cache.pop(path)
        return self._cache[path]

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> Dict:
        path, i = self._index[idx]
        return self._load(path)[i]


class PackedLoader:
    """Iterates packed batches; packing runs on a background thread.

    Sharding across hosts: pass process_index/process_count to give each
    host a disjoint scenario shard (reference DistributedSampler,
    train.py:119-121).
    """

    def __init__(
        self,
        dataset,
        config: Config,
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        drop_stats: Optional[list] = None,
        packer=None,
        scen_per_pack: Optional[int] = None,
        pack_workers: int = 1,
        shard_window: Optional[int] = None,
        to_device: bool = False,
    ):
        """packer: (scenarios, config) → (batch, stats); defaults to the
        LaneGCN pack_batch. For LaneRCNN pass a pack_roi_batch wrapper.

        to_device: transfer each packed batch to the default device INSIDE
        the worker thread (jnp.asarray per leaf) so host→device copies
        overlap the previous step instead of serializing on the main
        thread (measured on the axon relay: 497 → 841 scen/s e2e — the
        relay queues a main-thread transfer behind the in-flight step).
        Leave False for multi-host paths that assemble global arrays from
        host numpy."""
        self.dataset = dataset
        self.config = config
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.drop_stats = drop_stats
        self.packer = packer or (
            lambda scens, cfg: pack_batch(scens, cfg.pack, cfg.model)
        )
        self.scen_per_pack = scen_per_pack or config.pack.max_scenarios
        self.pack_workers = pack_workers
        self.shard_window = shard_window
        self.to_device = to_device
        # Worker-thread seconds spent on host→device transfers (to_device
        # mode), reset per epoch() call. This is the transfer time HIDDEN
        # behind compute on a host with async DMA; on the axon relay it is
        # the serialized-transfer term that explains device-rate vs e2e-rate
        # (docs/PERFORMANCE.md "Host packing / e2e"). bench.py publishes it
        # as transfer_hidden_ms_per_pack.
        self.transfer_s = 0.0
        self.transfer_packs = 0

    def _epoch_order(self, epoch: int) -> np.ndarray:
        """Epoch scenario order: full Fisher-Yates for in-memory datasets;
        windowed shard-aware shuffle for ShardDataset-like datasets
        (shuffle shard order, then shuffle scenarios within each window of
        W shards) so a shuffled epoch unpickles each shard once instead of
        thrashing the shard cache on random global access. All processes
        compute the same order from the shared seed, so the strided
        process shards below stay disjoint (reference DistributedSampler,
        train.py:119-121)."""
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + epoch)
        spans = getattr(self.dataset, "shard_spans", None)
        if not self.shuffle:
            order = np.arange(n)
        elif spans and len(spans) > 1:
            window = self.shard_window or max(
                getattr(self.dataset, "cache_shards", 3) - 1, 1
            )
            shard_order = rng.permutation(len(spans))
            parts = []
            for w in range(0, len(shard_order), window):
                idcs = np.concatenate(
                    [np.arange(*spans[s]) for s in shard_order[w : w + window]]
                )
                rng.shuffle(idcs)
                parts.append(idcs)
            order = np.concatenate(parts)
        else:
            order = rng.permutation(n)
        return order[self.process_index :: self.process_count]

    def epoch(self, epoch: int = 0) -> Iterator:
        """Yield packed batches (numpy leaves) for one epoch.

        With pack_workers > 1, groups are fetched+packed by a thread pool in
        order-preserving fashion (numpy/C kernels release the GIL, so 2-4
        workers keep a fast device fed)."""
        order = self._epoch_order(epoch)
        self.transfer_s = 0.0
        self.transfer_packs = 0
        scen_per_pack = self.scen_per_pack
        groups = [
            order[i : i + scen_per_pack].tolist()
            for i in range(0, len(order), scen_per_pack)
        ]

        def build(group_idcs):
            group = [self.dataset[int(i)] for i in group_idcs]
            batch, stats = self.packer(group, self.config)
            if self.drop_stats is not None:
                self.drop_stats.append(stats)
            if self.to_device:
                import time

                import jax

                from lanegcn_tpu.data.blob import device_put_blob

                if callable(self.to_device):
                    # Custom transfer (e.g. the mesh path's sharded blob
                    # put — cli.py wires device_put_blob(sharding=...)).
                    t0 = time.time()
                    batch = self.to_device(batch)
                    self.transfer_s += time.time() - t0
                    self.transfer_packs += 1
                    return batch
                t0 = time.time()
                # Dtype-grouped blobs + on-device split: the relay charges a
                # ~50 ms round trip PER ARRAY, so leaf-wise transfers cost
                # ~1.5 s/pack for ~90 leaves (measured round 4). Do NOT
                # block: the unpack program queues behind in-flight train
                # steps, and a blocking worker serializes the whole loader
                # behind the device (measured 249 scen/s e2e vs 1,700
                # device-side). Dispatch is async; the consuming step waits
                # on its inputs naturally.
                batch = device_put_blob(batch)
                self.transfer_s += time.time() - t0
                self.transfer_packs += 1
            return batch

        if self.pack_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.pack_workers) as pool:
                pending = []
                it = iter(groups)
                for _ in range(self.prefetch + self.pack_workers):
                    g = next(it, None)
                    if g is not None:
                        pending.append(pool.submit(build, g))
                while pending:
                    fut = pending.pop(0)
                    g = next(it, None)
                    if g is not None:
                        pending.append(pool.submit(build, g))
                    yield fut.result()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            for g in groups:
                q.put(build(g))
            q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()

    def steps_per_epoch(self) -> int:
        n = len(self._epoch_order(0))
        return max(1, -(-n // self.scen_per_pack))
