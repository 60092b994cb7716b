"""Fused-image writing + loading helpers.

Mirrors the reference's output pipeline (/root/reference/val_performance.py:
453-466 and test_fusion.py:112-126): clip to [0,1], quantize to uint8,
global min-max stretch, re-quantize. That double quantization is a
reference quirk; `quantize_like_reference=True` reproduces it bit-for-bit
for fidelity comparisons, False does the sane single quantization.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def fused_to_uint8(fused_rgb01: np.ndarray,
                   quantize_like_reference: bool = True) -> np.ndarray:
    """[B, H, W, 3] float [0,1] -> uint8, with the reference's double
    quantization + batch-global min-max stretch."""
    x = np.clip(np.asarray(fused_rgb01), 0.0, 1.0)
    if quantize_like_reference:
        x = np.uint8(255.0 * x)
        x = (x - np.min(x)) / max(float(np.max(x)) - float(np.min(x)), 1e-12)
        return np.uint8(255.0 * x)
    lo, hi = float(x.min()), float(x.max())
    x = (x - lo) / max(hi - lo, 1e-12)
    return np.uint8(np.round(255.0 * x))


def save_png(path: str | Path, img: np.ndarray) -> None:
    from PIL import Image

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if img.dtype != np.uint8:
        img = np.uint8(np.clip(img, 0, 255))
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)


def write_fused_batch(out_dir: str | Path, names, fused_rgb01: np.ndarray,
                      quantize_like_reference: bool = True) -> None:
    """Write each fused image of a batch as <out_dir>/<name> (val_fusion's
    output contract, val_performance.py:461-466)."""
    imgs = fused_to_uint8(fused_rgb01, quantize_like_reference)
    for k, name in enumerate(names):
        save_png(Path(out_dir) / name, imgs[k])


def load_fused_dir(fused_dir: str | Path) -> Optional[np.ndarray]:
    from PIL import Image

    fused_dir = Path(fused_dir)
    if not fused_dir.exists():
        return None
    names = sorted(p.name for p in fused_dir.iterdir())
    return np.stack([
        np.asarray(Image.open(fused_dir / n)).astype(np.float32) / 255.0
        for n in names
    ])
