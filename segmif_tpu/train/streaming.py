"""Streaming dataset adapter for InteractiveTrainer (TrainConfig.streaming).

The default trainer path stacks whole splits into host RAM
(interactive._stack_dataset) — fine at FMB/MFNet scale (~1.5k images,
~1.3 GB uint8), a wall for anything larger. This adapter keeps the raw
folder dataset on disk (the Prefetcher's decode threads / NativeLoader read
per batch) and gives the regenerated fused images — the ONLY cross-phase
array the trainer must own — a uint8 np.memmap backing file instead of RAM,
replacing the reference's PNG round-trip through Mask/
(/root/reference/val_performance.py:461-466 -> train.py:123-135) with an
mmap the OS pages in on demand.

Protocol-compatible with interactive.InMemoryFusionDataset where the
trainer needs it: __len__/__getitem__ (5-tuple with the STATIC guide, what
the fusion phase trains on), seg_view() (5-tuple with the regenerated FUSED
image in slot 3, what the seg phase trains on), and sample_paths()
passthrough so the native C++ loader keeps owning the decode.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class StreamingFusionData:
    """Folder-dataset wrapper whose regenerated-fused storage is a disk
    memmap. `dataset` must yield (name, ir, vis, guide, label) with uniform
    image shapes (FMB/MFNet are 480x640 throughout)."""

    def __init__(self, dataset, cache_dir: str | Path, tag: str = "train"):
        self.ds = dataset
        self.names = list(getattr(dataset, "names",
                                  [dataset[i][0] for i in range(len(dataset))]))
        self.cache_path = Path(cache_dir) / f"fused_{tag}.u8"
        self._fused = None

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int):
        return self.ds[i]

    def sample_paths(self):
        fn = getattr(self.ds, "sample_paths", None)
        if fn is None:
            raise AttributeError("underlying dataset has no sample_paths")
        return fn()

    # ------------------------------------------------------- fused buffer ----
    def ensure_fused(self, h: int, w: int) -> np.memmap:
        """The [N, h, w, 3] uint8 memmap holding the latest regenerated
        fused images (created on first use; flushed by the writer)."""
        if self._fused is None:
            self.cache_path.parent.mkdir(parents=True, exist_ok=True)
            mode = "r+" if self.cache_path.exists() else "w+"
            try:
                self._fused = np.memmap(self.cache_path, dtype=np.uint8,
                                        mode=mode,
                                        shape=(len(self), h, w, 3))
            except ValueError:
                # stale cache of a different geometry — recreate
                self._fused = np.memmap(self.cache_path, dtype=np.uint8,
                                        mode="w+",
                                        shape=(len(self), h, w, 3))
        return self._fused

    @property
    def fused(self):
        if self._fused is None:
            raise RuntimeError(
                "fused images not generated yet — run regenerate_fused "
                "(the seg phase always follows it in InteractiveTrainer.run)")
        return self._fused

    def seg_view(self) -> "_StreamingSegView":
        return _StreamingSegView(self)


class _StreamingSegView:
    """5-tuple view with slot 3 = the regenerated fused image (memmap row),
    mirroring interactive._SegPhaseView."""

    def __init__(self, base: StreamingFusionData):
        self.base = base

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int):
        n, ir, vis, _, label = self.base.ds[i]
        return n, ir, vis, np.asarray(self.base.fused[i]), label
