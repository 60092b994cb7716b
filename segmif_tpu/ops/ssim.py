"""Differentiable windowed SSIM, channel-last (NHWC), pure jnp.

Matches the reference's pytorch_ssim (/root/reference/pytorch_ssim/__init__.py):
11x11 separable Gaussian window sigma=1.5 (normalized), zero padding
window//2, C1=0.01^2, C2=0.03^2, biased (population) variance estimates.

The separable blur is computed as two banded-Toeplitz MATMULS (one [H,H],
one [W,W]) instead of depthwise convs: SSIM runs on 1-channel fused-Y
planes, and a channels=1 depthwise conv uses 1/128 of the TPU's lanes —
the e21 train profile measured those convs at 9-50 GF/s, ~143 ms/step of
the fusion train step. The Toeplitz contraction runs on the MXU with full
lanes; its transpose (the SSIM backward) is the same matmul with T^T.

Note: zero padding + normalized window means border statistics are damped
exactly as in the reference (the window is NOT renormalized at borders) —
the Toeplitz rows near the border simply truncate, which is the same
math.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .filters import gaussian_kernel_1d


def _toeplitz(n: int, win: jnp.ndarray, pad: int, dtype) -> jnp.ndarray:
    """[n, n] banded matrix T with T[i, j] = win[j - i + pad] for
    |j - i| <= pad, else 0 — out[i] = sum_j T[i, j] x[j] is exactly the
    zero-padded 1-D correlation the depthwise conv computed."""
    i = jnp.arange(n)
    d = i[None, :] - i[:, None]
    return jnp.where(jnp.abs(d) <= pad,
                     win[jnp.clip(d + pad, 0, 2 * pad)], 0.0).astype(dtype)


def _blur(x: jnp.ndarray, win: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Separable Gaussian filter for NHWC x, zero-padded, as two MXU
    matmuls over the H and W axes."""
    h, w = x.shape[1], x.shape[2]
    th = _toeplitz(h, win, pad, x.dtype)
    tw = _toeplitz(w, win, pad, x.dtype)
    x = jnp.einsum("bhwc,hk->bkwc", x, th,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("bhwc,wk->bhkc", x, tw,
                   precision=jax.lax.Precision.HIGHEST)
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
