"""Image ops: resize, normalization, padding. Channel-last (NHWC), pure jnp.

Replaces the reference's torch.nn.functional.interpolate(mode='bilinear',
align_corners=False) call sites (e.g. /root/reference/core/segformer_head.py:66-74,
core/mix_transformer.py:364-373) and the per-channel ImageNet normalization of
Network3 (/root/reference/core/model_fusion.py:1079-1085) — functionally, not
in-place.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([123.675, 116.28, 103.53], dtype=jnp.float32)
IMAGENET_STD = jnp.array([58.395, 57.12, 57.375], dtype=jnp.float32)


def resize_bilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., size[0], size[1], C].

    Half-pixel-center sampling, equivalent to torch's
    interpolate(mode='bilinear', align_corners=False) for upsampling.
    antialias=False matches torch semantics when downsampling too.
    """
    h, w = int(size[0]), int(size[1])
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def resize_nearest(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbor resize of [..., H, W, C] (used for label maps)."""
    h, w = int(size[0]), int(size[1])
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")


def normalize_imagenet(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB [..., 3] -> ImageNet-normalized, matching Network3.forward

    (x*255 - mean) / std with mean/std from
    /root/reference/core/model_fusion.py:1079-1080.
    """
    mean = IMAGENET_MEAN.astype(rgb01.dtype)
    std = IMAGENET_STD.astype(rgb01.dtype)
    return (rgb01 * 255.0 - mean) / std


def pad_to(x: jnp.ndarray, h: int, w: int, value: float = 0.0) -> jnp.ndarray:
    """Bottom/right-pad [..., H, W, C] to at least (h, w) with a constant."""
    ph = max(h - x.shape[-3], 0)
    pw = max(w - x.shape[-2], 0)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad, constant_values=value)
