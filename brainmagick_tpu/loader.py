"""Host-side batch loader with background prefetch.

Replaces torch DataLoader + flashy.distrib.loader (bm/solver.py:120-130).
Items are cheap memmap slices (see dataset.SegmentDataset), so a small
thread pool + a bounded prefetch queue keeps the accelerator fed; batches
are fixed-shape (the trailing partial batch is zero-weight padded so
jitted steps never recompile).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import typing as tp
from concurrent import futures

import numpy as np

from .dataset import SegmentBatch


class Loader:
    def __init__(self, dataset: tp.Any, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, num_workers: int = 4,
                 prefetch: int = 2, with_events: bool = False,
                 assemble_dtype: tp.Optional[str] = None) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.with_events = with_events
        #: 'bfloat16' assembles meg/features in the wire format inside
        #: the native gather (parallel.assemble_dtype) — halves host
        #: memory traffic vs assemble-fp32-then-cast-at-transfer.
        self.assemble_dtype = assemble_dtype
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch (DistributedSampler
        set_epoch parity, bm/solver.py:331-334)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> tp.Iterator[tp.Tuple[SegmentBatch, np.ndarray]]:
        """Yields (batch, pad_weight) — pad_weight is 0 for padding rows
        added to fill the trailing partial batch."""
        indices = self._indices()
        n = len(indices)
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build(b: int):
            lo = b * self.batch_size
            chunk = indices[lo: lo + self.batch_size]
            pad_weight = np.ones(self.batch_size, dtype=np.float32)
            if len(chunk) < self.batch_size:
                pad = self.batch_size - len(chunk)
                pad_weight[len(chunk):] = 0.
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad)])
            if hasattr(self.dataset, "get_batch"):
                # native multithreaded gather (one pass for the whole
                # batch). dtype only when set: duck-typed test datasets
                # provide get_batch without the kwarg
                kw = ({"dtype": self.assemble_dtype}
                      if self.assemble_dtype else {})
                batch = self.dataset.get_batch(
                    chunk, with_events=self.with_events, **kw)
            else:
                batch = SegmentBatch.collate(
                    [self.dataset[int(i)] for i in chunk])
            if self.assemble_dtype and self.assemble_dtype != "float32":
                if np.asarray(batch.meg).dtype != self.assemble_dtype:
                    batch = dataclasses.replace(
                        batch,
                        meg=batch.meg.astype(self.assemble_dtype),
                        features=batch.features.astype(self.assemble_dtype))
            return batch, pad_weight

        def producer():
            # sliding window of outstanding jobs so memory stays bounded.
            # Exceptions are forwarded through the queue — a dead producer
            # that never enqueues the sentinel would deadlock the consumer.
            try:
                window = self.num_workers + self.prefetch
                with futures.ThreadPoolExecutor(self.num_workers) as pool:
                    jobs: "queue.Queue" = queue.Queue()
                    next_b = 0
                    while next_b < min(window, n_batches):
                        jobs.put(pool.submit(build, next_b))
                        next_b += 1
                    while not jobs.empty():
                        job = jobs.get()
                        if stop.is_set():
                            for other in list(jobs.queue):
                                other.cancel()
                            return
                        q.put(job.result())
                        if next_b < n_batches:
                            jobs.put(pool.submit(build, next_b))
                            next_b += 1
                q.put(None)
            except BaseException as exc:  # noqa: BLE001 - forwarded
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer waiting on the bounded queue
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
