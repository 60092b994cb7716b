"""Differentiable windowed SSIM, channel-last (NHWC), pure jnp.

Matches the reference's pytorch_ssim (/root/reference/pytorch_ssim/__init__.py):
11x11 separable Gaussian window sigma=1.5 (normalized), zero padding
window//2, C1=0.01^2, C2=0.03^2, biased (population) variance estimates.
The Gaussian window is separable, so we run two 1-D depthwise convs instead
of one 2-D conv — fewer FLOPs and a layout XLA tiles well on TPU.

Note: zero padding + normalized window means border statistics are damped
exactly as in the reference (the window is NOT renormalized at borders).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .filters import gaussian_kernel_1d


def _blur(x: jnp.ndarray, win: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Separable depthwise Gaussian filter for NHWC x, zero-padded."""
    c = x.shape[-1]
    kh = jnp.tile(win[:, None, None, None], (1, 1, 1, c)).astype(x.dtype)
    kw = jnp.tile(win[None, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return x


@functools.partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True, sigma: float = 1.5) -> jnp.ndarray:
    """SSIM between NHWC images. Returns scalar mean (size_average) or
    per-image mean [N]."""
    win = jnp.asarray(gaussian_kernel_1d(window_size, sigma), dtype=img1.dtype)
    pad = window_size // 2

    mu1 = _blur(img1, win, pad)
    mu2 = _blur(img2, win, pad)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win, pad) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win, pad) - mu2_sq
    sigma12 = _blur(img1 * img2, win, pad) - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
