"""Small fixed-filter convolutions: Sobel magnitude, Gaussian smoothing,
Laplacian (unsharp) pyramid. Channel-last (NHWC), pure jnp.

TPU-native equivalents of the reference's fixed-kernel torch convs:
 - Sobel |Gx|+|Gy|: /root/reference/core/loss.py:634-650
 - Gaussian `smoothing` + 3-level unsharp pyramid: /root/reference/lap_loss.py:39-80
These are depthwise convs; XLA maps them to the VPU/MXU directly, so no
Pallas kernel is needed — the win comes from fusing them into the surrounding
loss computation within one jit.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_SOBEL_X = jnp.array(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=jnp.float32
)
_SOBEL_Y = jnp.array(
    [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], dtype=jnp.float32
)


def depthwise_conv2d(x: jnp.ndarray, kernel2d: jnp.ndarray, padding) -> jnp.ndarray:
    """Depthwise 2-D conv of NHWC x with a single 2-D kernel applied per channel.

    padding: 'SAME'-style explicit list [(ph, ph), (pw, pw)] or lax padding str.
    Zero padding (matches torch.nn.functional.conv2d default).
    """
    c = x.shape[-1]
    k = kernel2d.astype(x.dtype)
    # HWIO with feature_group_count=C: [kh, kw, 1, C]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _toeplitz_1d(n: int, win, dtype) -> jnp.ndarray:
    """[n, n] banded matrix of the zero-padded 1-D correlation with `win`
    (odd length): out[i] = sum_j T[i, j] x[j]."""
    win = jnp.asarray(win, jnp.float32)
    pad = win.shape[0] // 2
    i = jnp.arange(n)
    d = i[None, :] - i[:, None]
    return jnp.where(jnp.abs(d) <= pad,
                     win[jnp.clip(d + pad, 0, 2 * pad)], 0.0).astype(dtype)


def separable_filter(x: jnp.ndarray, win_h, win_w) -> jnp.ndarray:
    """Separable fixed filter for NHWC x (zero padding), as two
    banded-Toeplitz MXU matmuls instead of a depthwise conv: the losses
    apply these to 1-channel Y planes, where a depthwise conv uses 1/128
    of the TPU's lanes (e21 profile: 9-50 GF/s, the single biggest
    train-step category before this rewrite)."""
    th = _toeplitz_1d(x.shape[1], win_h, x.dtype)
    tw = _toeplitz_1d(x.shape[2], win_w, x.dtype)
    # Contract the SECOND Toeplitz index so out[k] = sum_h T[k, h] x[h] —
    # true correlation per _toeplitz_1d's contract. (Contracting the first
    # index applies the flipped window; symmetric/abs-wrapped callers can't
    # tell, but asymmetric windows would come out sign/shift-flipped.)
    x = jnp.einsum("bhwc,kh->bkwc", x, th,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bhwc,kw->bhkc", x, tw,
                      precision=jax.lax.Precision.HIGHEST)


def sobel_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x(x)| + |sobel_y(x)| for NHWC x (any channel count).

    Sobel is separable: Gx = [1,2,1]^T (x) [-1,0,1], Gy = [1,2,1] along W
    with [-1,0,1] along H (sign per _SOBEL_Y's top-positive convention).
    NOTE conv vs correlation: torch's F.conv2d is a CORRELATION with the
    kernel as written (loss.py:634-650), which these windows reproduce."""
    gx = separable_filter(x, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    gy = separable_filter(x, (1.0, 0.0, -1.0), (1.0, 2.0, 1.0))
    return jnp.abs(gx) + jnp.abs(gy)


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(size: int, sigma: float):
    """Normalized 1-D Gaussian, matlab-style (pytorch_ssim/__init__.py:8-10)."""
    xs = [math.exp(-((i - size // 2) ** 2) / (2.0 * sigma**2)) for i in range(size)]
    s = sum(xs)
    return tuple(v / s for v in xs)


def gaussian_kernel_2d_grid(size: int, sigma: float) -> jnp.ndarray:
    """Normalized 2-D Gaussian built on an integer coordinate grid centered at
    (size-1)/2 — exactly the `smoothing` kernel of /root/reference/lap_loss.py:39-63.
    """
    coords = jnp.arange(size, dtype=jnp.float32)
    mean = (size - 1) / 2.0
    g = jnp.exp(-(((coords - mean) ** 2)[:, None] + ((coords - mean) ** 2)[None, :]) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def gaussian_blur(x: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """Gaussian blur with zero padding size//2 (NHWC). The grid kernel of
    gaussian_kernel_2d_grid is exactly separable (exp(-(a^2+b^2)) =
    exp(-a^2)exp(-b^2), and the 2-D normalizer is the product of the 1-D
    ones), so this runs as two Toeplitz matmuls."""
    coords = jnp.arange(size, dtype=jnp.float32)
    mean = (size - 1) / 2.0
    g1 = jnp.exp(-((coords - mean) ** 2) / (2.0 * sigma**2))
    g1 = g1 / jnp.sum(g1)
    return separable_filter(x, g1, g1)


def unsharp_pyramid(x: jnp.ndarray, sizes=(3, 5, 7), sigma: float = 2.0):
    """The reference's 'laplacian_pyramid' (lap_loss.py:74-80): same-resolution
    band-pass levels x - gaussian_blur(x) for each kernel size."""
    return [x - gaussian_blur(x, s, sigma) for s in sizes]
