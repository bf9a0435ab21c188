"""Batch loading: sampler + threaded prefetch + device double-buffering.

TPU-native replacement for the reference's torch DataLoader stack
(EnlargedSampler at /root/reference/neosr/data/data_sampler.py:8-54, worker
processes at data/__init__.py:53-125, CUDAPrefetcher at
prefetch_dataloader.py:69-113).  Design:

* `EnlargedSampler` — identical semantics: epoch-seeded randperm over
  dataset * enlarge_ratio, strided by process index so each host reads only
  its shard (replaces DDP rank striding).
* `TrainLoader` — a thread pool decodes/crops samples and a background
  collator fills a bounded queue with NHWC numpy batches; the training loop
  overlaps host decode with device compute without torch worker processes.
* Device transfer happens in the trainer via `jax.device_put` onto the mesh
  (see neosr_tpu.parallel.shard_batch); queue depth 2 gives the same
  double-buffering the CUDA side-stream prefetcher provided.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np


class EnlargedSampler:
    """Epoch-seeded, rank-strided index sampler with virtual enlargement."""

    def __init__(
        self, num_samples: int, world_size: int = 1, rank: int = 0, ratio: int = 1,
        seed: int = 0,
    ) -> None:
        self.dataset_size = num_samples
        self.world_size = world_size
        self.rank = rank
        self.seed = seed
        self.epoch = 0
        self.total_size = int(np.ceil(num_samples * ratio / world_size)) * world_size
        self.num_samples = self.total_size // world_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed + self.epoch)
        indices = rng.permutation(self.total_size) % self.dataset_size
        indices = indices[self.rank : self.total_size : self.world_size]
        return iter(indices.tolist())

    def __len__(self) -> int:
        return self.num_samples


def collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack array fields to NHWC batches; gather scalars/strings to lists."""
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals if len(vals) > 1 else vals[0]
    return out


class TrainLoader:
    """Infinite, shuffled, prefetched batch iterator over a dataset."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        sampler: EnlargedSampler,
        num_workers: int = 4,
        prefetch_depth: int = 2,
        drop_last: bool = True,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.drop_last = drop_last
        self.seed = seed
        self._pos = 0  # global position in the index stream
        self.pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
        self.q: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self._stop = threading.Event()
        self._epoch = 0
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _fetch(self, idx: int, pos: int) -> Any:
        """Fetch one sample with a per-position RNG: sample randomness
        (crops/flips/kernel draws) derives from (loader seed, global stream
        position), NOT from a dataset-shared generator raced by the worker
        threads — so a run is bit-reproducible and, at a fixed global batch,
        device-count invariant (the dp numerical-equivalence contract)."""
        fetch = getattr(self.dataset, "fetch", None)
        if fetch is not None:
            return fetch(idx, np.random.default_rng((self.seed, pos)))
        return self.dataset[idx]

    def _producer(self) -> None:
        # continuous index stream across virtual epochs: a dataset smaller
        # than the global batch still yields full batches (indices simply
        # span epoch boundaries) instead of deadlocking on drop_last
        buf: list[int] = []
        while not self._stop.is_set():
            self.sampler.set_epoch(self._epoch)
            self._epoch += 1
            buf.extend(iter(self.sampler))
            while len(buf) >= self.batch_size and not self._stop.is_set():
                chunk = buf[: self.batch_size]
                del buf[: self.batch_size]
                positions = range(self._pos, self._pos + self.batch_size)
                self._pos += self.batch_size
                try:
                    samples = list(self.pool.map(self._fetch, chunk, positions))
                    batch = collate(samples)
                except Exception as e:  # surface worker errors to consumer
                    batch = e
                while not self._stop.is_set():
                    try:
                        self.q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

    def __iter__(self) -> "TrainLoader":
        return self

    def __next__(self) -> dict[str, Any]:
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.pool.shutdown(wait=False)


class EvalLoader:
    """Sequential batch-of-1 loader for validation/test."""

    def __init__(self, dataset: Any) -> None:
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        for i in range(len(self.dataset)):
            yield collate([self.dataset[i]])
