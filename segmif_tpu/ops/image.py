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


def bilinear_weight_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """The [n_out, n_in] linear operator of 1-D bilinear resize, extracted by
    resizing an identity matrix — bit-identical weights to jax.image.resize
    (half-pixel centers, antialias=False), rows sum to 1. Constant-folded by
    XLA at trace time (shapes are static)."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return jax.image.resize(eye, (n_out, n_in), method="bilinear",
                            antialias=False)


def resize_bilinear_phase(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """phase_split(resize_bilinear(x, size)) WITHOUT materializing the
    full-res image or paying its phase transpose: each 2x2 pixel-parity
    phase plane of the upsampled image is produced directly by a row/col
    subset of the bilinear operator, applied as two MXU dots per plane.

    x: [B, h_in, w_in, C]; size: (H, W), both even. Returns
    [B, 4, H/2, W/2, C] in phase_split order (p = 2*row_parity+col_parity).
    Same total FLOPs as the full resize (the operator is just row-sliced);
    saves the [B,H,W,C] intermediate and its ~5.5 ms phase transpose on the
    fusion trunk's tap path (OPTIMIZATION.md round-2 addendum 3)."""
    h, w = int(size[0]), int(size[1])
    wh = bilinear_weight_matrix(x.shape[1], h).astype(x.dtype)
    ww = bilinear_weight_matrix(x.shape[2], w).astype(x.dtype)
    planes = []
    for rp in (0, 1):
        yr = jnp.einsum("oi,bijc->bojc", wh[rp::2], x)
        for cp in (0, 1):
            planes.append(jnp.einsum("bojc,pj->bopc", yr, ww[cp::2]))
    return jnp.stack(planes, 1)


def resize_bilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., size[0], size[1], C].

    Half-pixel-center sampling, equivalent to torch's
    interpolate(mode='bilinear', align_corners=False) for upsampling.
    antialias=False matches torch semantics when downsampling too.
    """
    h, w = int(size[0]), int(size[1])
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False)


def upsample_bilinear_int(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Exact integer-factor half-pixel bilinear upsample of [..., H, W, C]
    (same math as resize_bilinear to float rounding) as shifted lerps.

    NOTE (v5e, measured): this is 4x SLOWER than jax.image.resize's dot
    lowering at the encoder-tap shapes (7.0 vs 1.7 ms for the 4x/8x pair
    at batch 8) — the per-phase plane stack lowers to dynamic-update-slice
    chains. Kept as the lowest-HBM-footprint form (no transposed dot
    operands; useful under training memory pressure), not on the hot
    path."""

    def up1(t, axis):
        idx = [slice(None)] * t.ndim
        idx0, idxm, idx1 = list(idx), list(idx), list(idx)
        idx0[axis] = slice(0, 1)
        idxm[axis] = slice(0, -1)
        xm1 = jnp.concatenate([t[tuple(idx0)], t[tuple(idxm)]], axis)
        idx1[axis] = slice(1, None)
        idx0[axis] = slice(-1, None)
        xp1 = jnp.concatenate([t[tuple(idx1)], t[tuple(idx0)]], axis)
        planes = []
        for k in range(s):
            f = (k + 0.5) / s - 0.5
            lo = -1 if f < 0 else 0
            w = jnp.asarray(f - lo, t.dtype)
            a, b = (xm1, t) if lo < 0 else (t, xp1)
            planes.append((1 - w) * a + w * b)
        y = jnp.stack(planes, axis=axis + 1 if axis >= 0 else t.ndim + axis + 1)
        sh = list(t.shape)
        sh[axis] *= s
        return y.reshape(sh)

    return up1(up1(x, -3), -2)


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
