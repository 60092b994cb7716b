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


def sobel_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """|sobel_x(x)| + |sobel_y(x)| for NHWC x (any channel count, depthwise)."""
    gx = depthwise_conv2d(x, _SOBEL_X, [(1, 1), (1, 1)])
    gy = depthwise_conv2d(x, _SOBEL_Y, [(1, 1), (1, 1)])
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
    """Depthwise Gaussian blur with zero padding size//2 (NHWC)."""
    k = gaussian_kernel_2d_grid(size, sigma)
    p = size // 2
    return depthwise_conv2d(x, k, [(p, p), (p, p)])


def unsharp_pyramid(x: jnp.ndarray, sizes=(3, 5, 7), sigma: float = 2.0):
    """The reference's 'laplacian_pyramid' (lap_loss.py:74-80): same-resolution
    band-pass levels x - gaussian_blur(x) for each kernel size."""
    return [x - gaussian_blur(x, s, sigma) for s in sizes]
