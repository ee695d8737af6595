"""Batch loader with background prefetch.

Torch-free DataLoader replacement: worker threads run the host transform
(decode + crop), batches are assembled as contiguous uint8 arrays ready for a
single host→device transfer. Double-buffered: the next batch decodes while the
TPU runs the current step (reference relies on torch DataLoader workers,
``main.py:780-786``).
"""
from __future__ import annotations

import queue
import threading
import typing as typ

import numpy as np


class DataLoader:
    def __init__(self, dataset, sampler, batch_size: int,
                 drop_last: bool = False, num_workers: int = 4,
                 prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def _batches(self) -> typ.Iterator[typ.List[int]]:
        batch: typ.List[int] = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def _fetch(self, indices: typ.List[int]):
        imgs, targets = [], []
        for i in indices:
            img, t = self.dataset[i]
            imgs.append(img)
            targets.append(t)
        return np.stack(imgs), np.asarray(targets, dtype=np.int64)

    def __iter__(self):
        if self.num_workers <= 1:
            for batch in self._batches():
                yield self._fetch(batch)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = list(self._batches())
        SENTINEL = object()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    futures = [pool.submit(self._fetch, b) for b in batches]
                    for f in futures:
                        out_q.put(f.result())
            except Exception as e:  # surface worker failures to the consumer
                out_q.put(e)
            finally:
                out_q.put(SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = out_q.get()
            if item is SENTINEL:
                break
            if isinstance(item, Exception):
                raise item
            yield item
