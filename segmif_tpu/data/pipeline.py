"""Host input pipeline: threaded prefetch, per-process sharding, batching.

Replaces the reference's torch DataLoader worker processes
(/root/reference/train.py:287-294). Decoding runs in a thread pool (PIL
releases the GIL in the decoder), batches are stacked into pinned numpy
buffers, and augmentation happens on DEVICE afterwards (augment.py), so the
host only decodes + stacks.

Multi-host: each process takes names[i::process_count] — the
jax.process_index()-sharded split the TPU runtime expects.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np


class Prefetcher:
    """Infinite shuffled batch iterator with background decode threads.

    Yields dicts of stacked numpy arrays:
      {'ir': [B,H,W,3], 'vis': [B,H,W,3], 'guide': [B,H,W,3],
       'label': [B,H,W]} (all float32 except int32 label).
    Samples must share one shape (the reference's datasets are fixed-size per
    split); static shapes keep XLA from recompiling.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_threads: int = 4, prefetch_depth: int = 4,
                 shard_by_process: bool = True, drop_last: bool = True,
                 loop: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.loop = loop
        self.drop_last = drop_last
        idx = np.arange(len(dataset))
        if shard_by_process and jax.process_count() > 1:
            idx = idx[jax.process_index()::jax.process_count()]
        self.indices = idx
        self._q: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._pool_size = num_threads
        self._thread.start()

    def _load_batch(self, batch_idx) -> dict:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self._pool_size) as ex:
            samples = list(ex.map(self.ds.__getitem__, batch_idx))
        _, irs, viss, guides, labels = zip(*samples)
        return {
            "ir": np.stack(irs).astype(np.float32),
            "vis": np.stack(viss).astype(np.float32),
            "guide": np.stack(guides).astype(np.float32),
            "label": np.stack(labels).astype(np.int32),
        }

    def _producer(self):
        while not self._stop.is_set():
            order = self.rng.permutation(self.indices)
            nb = len(order) // self.batch_size
            for b in range(nb):
                if self._stop.is_set():
                    return
                batch_idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                self._q.put(self._load_batch(batch_idx))
            if not self.loop:
                self._q.put(None)
                return

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def iterate_eval(dataset, batch_size: int = 1):
    """Simple sequential eval iterator yielding (names, batch_dict).
    Pads the final partial batch by repeating the last sample and reports
    the true count."""
    n = len(dataset)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        true_count = len(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        samples = [dataset[i] for i in idxs]
        names = [s[0] for s in samples]
        arrays = list(zip(*[s[1:] for s in samples]))
        stacked = [np.stack(a) if a[0] is not None else None for a in arrays]
        yield names[:true_count], true_count, stacked
