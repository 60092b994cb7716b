"""E3: host input-pipeline microbench at flagship shapes (480x640, batch 8).

Done-criterion for the round-2 pipeline work: show the host loader is not
the bottleneck — device joint step is ~210 ms (37.6 pairs/s at b8), so the
loader must sustain >> 4.8 batches/s. Measures the Prefetcher's native
(C++ NativeLoader) and python (thread pool + per-file decode) paths over a
synthetic on-disk FMB-sized split.
"""
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

from segmif_tpu.data.datasets import FusionFolderDataset
from segmif_tpu.data.pipeline import Prefetcher


def make_split(root: Path, n: int = 32, h: int = 480, w: int = 640):
    rng = np.random.default_rng(0)
    for sub in ("Infrared", "Visible", "Mask2", "Label"):
        (root / sub).mkdir()
    for i in range(n):
        name = f"{i:05d}.png"
        Image.fromarray(rng.integers(0, 255, (h, w), np.uint8)).save(
            root / "Infrared" / name)
        for sub in ("Visible", "Mask2"):
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8)).save(
                root / sub / name)
        Image.fromarray(rng.integers(0, 9, (h, w), np.uint8)).save(
            root / "Label" / name)


def bench(ds, use_native: bool, batches: int = 24, batch_size: int = 8):
    pf = Prefetcher(ds, batch_size, num_threads=8, prefetch_depth=4,
                    use_native=use_native)
    mode = "native" if pf._native is not None else "python"
    it = iter(pf)
    next(it)  # warm the queue/threads
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
    dt = time.perf_counter() - t0
    pf.close()
    print(f"{mode:7s}: {batches / dt:6.2f} batches/s "
          f"({batches * batch_size / dt:7.1f} pairs/s host-side)", flush=True)
    return batches / dt


def bench_inmemory(n: int = 32, h: int = 480, w: int = 640):
    """The trainer's ACTUAL steady-state path: uint8 arrays in host RAM,
    Prefetcher stacks views (no decode, no float conversion)."""
    from segmif_tpu.train.interactive import InMemoryFusionDataset

    rng = np.random.default_rng(0)
    u8 = lambda *s: rng.integers(0, 255, s, np.uint8)  # noqa: E731
    ds = InMemoryFusionDataset(
        [str(i) for i in range(n)], u8(n, h, w, 3), u8(n, h, w, 3),
        u8(n, h, w, 3), rng.integers(0, 9, (n, h, w)).astype(np.int32))
    pf = Prefetcher(ds, 8, num_threads=8, prefetch_depth=4)
    it = iter(pf)
    next(it)
    t0 = time.perf_counter()
    for _ in range(48):
        next(it)
    dt = time.perf_counter() - t0
    pf.close()
    print(f"inmem  : {48 / dt:6.2f} batches/s ({48 * 8 / dt:7.1f} "
          f"pairs/s host-side)", flush=True)


def main():
    bench_inmemory()
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        print("writing synthetic 480x640 split...", flush=True)
        make_split(root)
        ds = FusionFolderDataset(root)
        bench(ds, use_native=True)
        bench(ds, use_native=False)


if __name__ == "__main__":
    main()
