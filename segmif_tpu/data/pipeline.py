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
from concurrent.futures import ThreadPoolExecutor
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
                 loop: bool = True, use_native: bool = True,
                 start_batch: int = 0):
        """start_batch fast-forwards the deterministic batch sequence: batch
        k of a Prefetcher(seed=s, start_batch=k) is batch k of
        Prefetcher(seed=s, start_batch=0) — the hook mid-phase training
        resume uses to replay the uninterrupted data order. The epoch-e
        shuffle is a pure function of (seed, e), so fast-forwarding costs
        nothing. Ignored on the native-loader path (its shuffle order lives
        in C++); resuming callers pass use_native=False."""
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.start_batch = start_batch
        self.loop = loop
        self.drop_last = drop_last
        if start_batch:
            use_native = False
        idx = np.arange(len(dataset))
        if shard_by_process and jax.process_count() > 1:
            idx = idx[jax.process_index()::jax.process_count()]
        self.indices = idx
        self._native = None
        if use_native and loop:
            self._native = self._try_native(num_threads, prefetch_depth, seed)
        if self._native is not None:
            return
        self._q: queue.Queue = queue.Queue(maxsize=prefetch_depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        # One persistent pool for the Prefetcher's lifetime — per-batch pool
        # construction costs thread spawns every step.
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self._thread.start()

    def _try_native(self, num_threads, prefetch_depth, seed):
        """Route the whole decode pipeline through the C++ NativeLoader when
        the dataset exposes per-sample path 4-tuples (ir, vis, guide, label)
        and the native runtime builds. Labels are decoded as 3ch float and
        channel 0 is cast back to int32 (class-id pngs are grayscale)."""
        paths_fn = getattr(self.ds, "sample_paths", None)
        if paths_fn is None:
            return None
        try:
            from . import native

            if not native.available():
                return None
            paths = paths_fn()
            if not paths or len(paths[0]) != 4:
                return None
            h, w, _ = native.probe_image(paths[0][0])
            sharded = [paths[i] for i in self.indices]
            return native.NativeLoader(
                sharded, self.batch_size, (h, w), channels=3,
                num_threads=num_threads, queue_depth=prefetch_depth,
                seed=seed + 1, resize=False)
        except Exception:
            return None

    def _load_batch(self, batch_idx) -> dict:
        samples = list(self._pool.map(self.ds.__getitem__, batch_idx))
        _, irs, viss, guides, labels = zip(*samples)
        # Preserve the source dtype: in-memory datasets hand out uint8 views
        # and the cast to float happens on device — 4x less host conversion
        # and host->device traffic than stacking to float32 here.
        return {
            "ir": np.stack(irs),
            "vis": np.stack(viss),
            "guide": np.stack(guides),
            "label": np.stack(labels).astype(np.int32),
        }

    def _producer(self):
        nb_per_epoch = max(len(self.indices) // self.batch_size, 1)
        epoch = self.start_batch // nb_per_epoch
        skip = self.start_batch % nb_per_epoch
        while not self._stop.is_set():
            # epoch order is a pure function of (seed, epoch) so a resumed
            # run replays the identical batch sequence
            order = np.random.default_rng(
                [self.seed, epoch]).permutation(self.indices)
            nb = len(order) // self.batch_size
            for b in range(skip, nb):
                if self._stop.is_set():
                    return
                batch_idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                self._q.put(self._load_batch(batch_idx))
            skip = 0
            epoch += 1
            if not self.loop:
                self._q.put(None)
                return

    def __iter__(self) -> Iterator[dict]:
        if self._native is not None:
            for arr in self._native:  # [B, 4, H, W, 3] float32 [0, 255]
                yield {
                    "ir": np.ascontiguousarray(arr[:, 0]),
                    "vis": np.ascontiguousarray(arr[:, 1]),
                    "guide": np.ascontiguousarray(arr[:, 2]),
                    "label": arr[:, 3, :, :, 0].astype(np.int32),
                }
            return
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item

    def close(self):
        if self._native is not None:
            self._native.close()
            return
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False)


def iterate_eval(dataset, batch_size: int = 1, num_threads: int = 4,
                 prefetch_depth: int = 2):
    """Eval iterator yielding (names, true_count, arrays) with background
    prefetch, so host decode overlaps device compute. Pads the final partial
    batch by repeating the last sample and reports the true count."""
    n = len(dataset)

    def load(start):
        idxs = list(range(start, min(start + batch_size, n)))
        true_count = len(idxs)
        while len(idxs) < batch_size:
            idxs.append(idxs[-1])
        samples = [dataset[i] for i in idxs]
        names = [s[0] for s in samples]
        arrays = list(zip(*[s[1:] for s in samples]))
        stacked = [np.stack(a) if a[0] is not None else None for a in arrays]
        return names[:true_count], true_count, stacked

    starts = list(range(0, n, batch_size))
    with ThreadPoolExecutor(max_workers=num_threads) as ex:
        pending = [ex.submit(load, s) for s in starts[:prefetch_depth]]
        nxt = prefetch_depth
        while pending:
            fut = pending.pop(0)
            if nxt < len(starts):
                pending.append(ex.submit(load, starts[nxt]))
                nxt += 1
            yield fut.result()
