"""Batch loader: bucketed decode -> padded static-shape numpy batches,
with background prefetch.

Replaces the reference's torch DataLoader + collate (train_2d_cnn.py:301-353,
ops/padding.py:8-32). Decode runs in a thread pool overlapping the device
step (the reference used forked worker processes; here decode is
numpy/C-backed and releases the GIL in scipy/wave, and the TPU step dominates
anyway), and batches come out with bucket-static shapes ready for
``jax.device_put`` sharding.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional

import numpy as np

from freesound_classification_tpu.data.bucketing import (
    BucketBatchSampler,
    pad_to_length,
)
from freesound_classification_tpu.data.dataset import ClipDataset


class DataLoader:
    """Iterable of batch dicts with static shapes.

    Yields {"signal": (B, L_bucket) f32, "lengths": (B,) i32,
            "labels": (B, C) f32, "is_noisy": (B,) f32, "index": (B,) i64}.
    """

    def __init__(
        self,
        dataset: ClipDataset,
        sampler: BucketBatchSampler,
        train: bool = False,
        num_workers: int = 0,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.train = train
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0
        # multi-host SPMD (SURVEY §2b "keeps per-host data loading
        # disjoint"): every host builds the IDENTICAL global batch plan
        # (same sampler seed), then decodes only its own row slice of each
        # batch — hosts stay in lock-step with identical batch counts and
        # bucket shapes while reading disjoint clips. mesh.shard_batch
        # assembles the global array from the per-host shards.
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self) -> int:
        return len(self.sampler)

    def _bucket_length(self, indices: List[int]) -> int:
        from freesound_classification_tpu.data.bucketing import bucket_of

        b = bucket_of(self.sampler.lengths[indices], self.sampler.ladder)
        return int(self.sampler.ladder[int(b.max())])

    def _local_rows(self, indices: List[int]) -> List[int]:
        """This host's disjoint slice of a global batch's rows.

        Tail batches not divisible by process_count are padded by repeating
        the final index (mesh-padding style; every host computes the same
        padded plan, so the global batch stays consistent)."""
        if self.process_count <= 1:
            return list(indices)
        indices = list(indices)
        rem = (-len(indices)) % self.process_count
        indices = indices + [indices[-1]] * rem
        per = len(indices) // self.process_count
        return indices[self.process_index * per:
                       (self.process_index + 1) * per]

    def _make_batch(self, indices: List[int]) -> dict:
        length = self._bucket_length(indices)
        indices = self._local_rows(indices)
        n = len(indices)
        signal = np.zeros((n, length), dtype=np.float32)
        lengths = np.zeros(n, dtype=np.int32)
        labels = np.zeros((n, self.dataset.n_classes), dtype=np.float32)
        is_noisy = np.zeros(n, dtype=np.float32)
        for row, idx in enumerate(indices):
            audio = self.dataset.decode(
                idx, train=self.train, epoch=self._epoch)
            signal[row] = pad_to_length(audio, length)
            lengths[row] = min(audio.size, length)
            label, noisy = self.dataset.sample_meta(idx)
            labels[row] = label
            is_noisy[row] = noisy
        return {
            "signal": signal,
            "lengths": lengths,
            "labels": labels,
            "is_noisy": is_noisy,
            "index": np.asarray(indices, dtype=np.int64),
        }

    def __iter__(self) -> Iterator[dict]:
        # fresh shuffle every epoch (torch DataLoader(shuffle=True)
        # semantics; the bucketed batch plan is rebuilt under epoch-keyed
        # seeds so batch composition varies across epochs). The epoch
        # counter advances for every train-mode pass even when unshuffled,
        # so stochastic-crop TTA passes draw fresh crop offsets.
        if self.train:
            if self.sampler.shuffle:
                self.sampler.set_epoch(self._epoch)
            self._epoch += 1
        batches = list(self.sampler)
        if self.num_workers <= 0:
            for indices in batches:
                yield self._make_batch(indices)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [
                    pool.submit(self._make_batch, idxs) for idxs in batches
                ]
                for fut in futures:
                    if stop.is_set():
                        fut.cancel()
                        continue
                    try:
                        out_q.put(fut.result())
                    except Exception as e:  # surface decode errors
                        out_q.put(e)
                        return
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def make_loader(
    dataset: ClipDataset,
    ladder,
    batch_size: Optional[int] = None,
    max_batch_elems: Optional[int] = None,
    train: bool = False,
    shuffle: Optional[bool] = None,
    seed: int = 42,
    drop_last: Optional[bool] = None,
    size_multiple: int = 1,
    num_workers: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> DataLoader:
    """Convenience constructor wiring dataset lengths into the sampler.

    For multi-host SPMD, pass (process_index, process_count) — or leave
    None to pick them up from the JAX runtime — and a ``size_multiple``
    divisible by process_count so every global batch splits evenly.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    if shuffle is None:
        shuffle = train
    if drop_last is None:
        drop_last = train  # reference train loader: drop_last=True
    if process_count > 1:
        import math

        size_multiple = math.lcm(max(size_multiple, 1), process_count)
    sampler = BucketBatchSampler(
        dataset.lengths,
        ladder,
        batch_size=batch_size,
        max_batch_elems=max_batch_elems,
        shuffle=shuffle,
        seed=seed,
        drop_last=drop_last,
        size_multiple=size_multiple,
    )
    return DataLoader(dataset, sampler, train=train, num_workers=num_workers,
                      process_index=process_index,
                      process_count=process_count)
