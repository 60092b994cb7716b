"""ctypes bindings for the native (C++) data-loading runtime.

`runtime/dataloader.cpp` provides libpng/libjpeg decode, half-pixel bilinear
resize, and a std::thread batch pipeline behind a C ABI. This module builds
the .so on first use (g++, cached next to the source) and wraps it:

 - `decode_image(path, size=None, channels=3)` -> float32 [H, W, C] in
   [0, 255]
 - `NativeLoader` — drop-in replacement for data.pipeline.Prefetcher backed
   by native worker threads (no Python in the decode path).

Falls back cleanly: `available()` is False when the toolchain or libs are
missing, and callers keep using the PIL path.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parents[2] / "runtime"
_SO_PATH = _RUNTIME_DIR / "libsegmif_io.so"
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    src = _RUNTIME_DIR / "dataloader.cpp"
    if not src.exists():
        return "runtime/dataloader.cpp not found"
    cmd = ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", str(src),
           "-lpng", "-ljpeg", "-lpthread", "-o", str(_SO_PATH)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-500:]}"
    return None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    if not _SO_PATH.exists():
        src = _RUNTIME_DIR / "dataloader.cpp"
        if (not _SO_PATH.exists() or (src.exists() and
                                      src.stat().st_mtime > _SO_PATH.stat().st_mtime)):
            err = _build()
            if err:
                _build_error = err
                return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError as e:
        _build_error = str(e)
        return None
    lib.sfl_decode.restype = ctypes.c_int
    lib.sfl_decode.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int]
    lib.sfl_probe.restype = ctypes.c_int
    lib.sfl_probe.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int)] * 3
    lib.sfl_loader_create.restype = ctypes.c_void_p
    lib.sfl_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.sfl_loader_next.restype = ctypes.c_int
    lib.sfl_loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float)]
    lib.sfl_loader_destroy.restype = None
    lib.sfl_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe_image(path: str | Path) -> Tuple[int, int, int]:
    lib = _load()
    assert lib is not None, _build_error
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.sfl_probe(str(path).encode(), ctypes.byref(h), ctypes.byref(w),
                       ctypes.byref(c))
    if rc != 0:
        raise IOError(f"native probe failed for {path}")
    return h.value, w.value, c.value


def decode_image(path: str | Path, size: Optional[Tuple[int, int]] = None,
                 channels: int = 3) -> np.ndarray:
    """Decode PNG/JPEG to float32 [H, W, channels] in [0, 255]; optional
    bilinear resize to `size` (half-pixel centers)."""
    lib = _load()
    assert lib is not None, _build_error
    if size is None:
        h, w, _ = probe_image(path)
    else:
        h, w = size
    out = np.empty((h, w, channels), np.float32)
    rc = lib.sfl_decode(str(path).encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        h, w, channels, 1 if size is not None else 0)
    if rc != 0:
        raise IOError(f"native decode failed for {path} (rc={rc})")
    return out


class NativeLoader:
    """Infinite shuffled batch iterator over per-sample path tuples, with
    decode + resize running on native threads.

    paths: [n_samples][items] file paths; yields float32 arrays
    [batch, items, H, W, C] in [0, 255].
    """

    def __init__(self, paths: Sequence[Sequence[str]], batch_size: int,
                 size: Tuple[int, int], channels: int = 3,
                 num_threads: int = 4, queue_depth: int = 4, seed: int = 1,
                 resize: bool = True):
        lib = _load()
        assert lib is not None, _build_error
        self._lib = lib
        self.n = len(paths)
        self.items = len(paths[0])
        self.batch_size = batch_size
        self.h, self.w = size
        self.c = channels
        flat = [str(p).encode() for sample in paths for p in sample]
        arr = (ctypes.c_char_p * len(flat))(*flat)
        self._handle = lib.sfl_loader_create(
            arr, self.n, self.items, batch_size, self.h, self.w, channels,
            1 if resize else 0, num_threads, queue_depth, seed)
        assert self._handle, "native loader creation failed"

    def __iter__(self) -> Iterator[np.ndarray]:
        while self._handle:
            out = np.empty(
                (self.batch_size, self.items, self.h, self.w, self.c),
                np.float32)
            rc = self._lib.sfl_loader_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                return
            yield out

    def close(self):
        if self._handle:
            self._lib.sfl_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
