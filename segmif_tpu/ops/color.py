"""Color-space conversions, channel-last (NHWC), pure jnp.

TPU-native re-implementation of the RGB<->YCrCb conversions that the
reference duplicates five times (see /root/reference/core/model_fusion.py:69-111,
core/loss.py:399-422, train.py:246-263). BT.601-style constants:
Y = .299 R + .587 G + .114 B; Cr = (R - Y) * 0.713 + 0.5; Cb = (B - Y) * 0.564 + 0.5.
Inverse uses the matrix [[1,1,1],[1.403,-.714,0],[0,-.344,1.773]].

All functions take/return arrays whose LAST axis is the channel axis, which is
the layout this framework uses everywhere (NHWC is the efficient TPU layout).
"""
from __future__ import annotations

import jax.numpy as jnp

_INV_MAT = jnp.array(
    [[1.0, 1.0, 1.0], [1.403, -0.714, 0.0], [0.0, -0.344, 1.773]],
    dtype=jnp.float32,
)
_INV_BIAS = jnp.array([0.0, -0.5, -0.5], dtype=jnp.float32)


def rgb_to_ycrcb(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> [..., 3] (Y, Cr, Cb)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 0.5
    cb = (b - y) * 0.564 + 0.5
    return jnp.stack([y, cr, cb], axis=-1)


def ycrcb_to_rgb(ycrcb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (Y, Cr, Cb) -> [..., 3] RGB (unclipped, like the reference)."""
    mat = _INV_MAT.astype(ycrcb.dtype)
    bias = _INV_BIAS.astype(ycrcb.dtype)
    return (ycrcb + bias) @ mat


def recombine_fused(fused_y: jnp.ndarray, vis_ycrcb: jnp.ndarray) -> jnp.ndarray:
    """Replace the Y channel of a visible YCrCb image with the fused Y and
    convert to RGB, clipped to [0,1].

    Mirrors the recombination pipeline of /root/reference/test_fusion.py:102-111.
    fused_y: [..., H, W, 1]; vis_ycrcb: [..., H, W, 3].
    """
    ycrcb = jnp.concatenate([fused_y, vis_ycrcb[..., 1:]], axis=-1)
    rgb = ycrcb_to_rgb(ycrcb)
    return jnp.clip(rgb, 0.0, 1.0)


def minmax_stretch(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Global min-max renormalization to [0,1] (reference: model_fusion.py:207-209)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)


def mean_recombine(mask_y: jnp.ndarray, vis_rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's `Mean` module (model_fusion.py:184-214): replace the Y
    of the visible image with a fused-Y mask, back to RGB, clip, then global
    min-max renormalize. mask_y: [..., H, W, 1]; vis_rgb: [..., H, W, 3]."""
    vis_ycrcb = rgb_to_ycrcb(vis_rgb)
    rgb = ycrcb_to_rgb(jnp.concatenate([mask_y, vis_ycrcb[..., 1:]], axis=-1))
    return minmax_stretch(jnp.clip(rgb, 0.0, 1.0))
