"""E26 (round 4): bf16/TPU parity probe for the Toeplitz-matmul filters.

The oracle tests compare the new matmul formulations to torch in f32 on
CPU. Training runs bf16 on TPU — this probes, at the training dtype on
the real chip, the new `ops.ssim.ssim` / `ops.filters.sobel_magnitude` /
`gaussian_blur` against the OLD depthwise-conv formulation (inlined
here), plus the SSIM gradient w.r.t. the fused image (the training
signal).

Run on v5e:  python experiments/e26_blur_bf16_parity.py
"""
import _cache

import jax
import jax.numpy as jnp
import numpy as np

_cache.enable()

from segmif_tpu.ops.filters import (gaussian_kernel_1d,  # noqa: E402
                                    gaussian_kernel_2d_grid,
                                    sobel_magnitude)
from segmif_tpu.ops.ssim import ssim  # noqa: E402


def depthwise(x, k2d, pad):
    c = x.shape[-1]
    kern = jnp.tile(k2d.astype(x.dtype)[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def blur_conv(x, win, pad):
    kh = jnp.tile(win[:, None, None, None], (1, 1, 1, x.shape[-1]))
    kw = jnp.tile(win[None, :, None, None], (1, 1, 1, x.shape[-1]))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh.astype(x.dtype), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST)
    return jax.lax.conv_general_dilated(
        x, kw.astype(x.dtype), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST)


def ssim_conv(a, b, window_size=11, sigma=1.5):
    win = jnp.asarray(gaussian_kernel_1d(window_size, sigma), a.dtype)
    pad = window_size // 2
    mu1, mu2 = blur_conv(a, win, pad), blur_conv(b, win, pad)
    s1 = blur_conv(a * a, win, pad) - mu1 * mu1
    s2 = blur_conv(b * b, win, pad) - mu2 * mu2
    s12 = blur_conv(a * b, win, pad) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def sobel_conv(x):
    sx = jnp.asarray([[-1., 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sy = jnp.asarray([[1., 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    return jnp.abs(depthwise(x, sx, 1)) + jnp.abs(depthwise(x, sy, 1))


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        a = jnp.asarray(rng.uniform(0, 1, (2, 480, 640, 1)), dtype)
        b = jnp.asarray(rng.uniform(0, 1, (2, 480, 640, 1)), dtype)

        s_new = float(jax.jit(ssim)(a, b))
        s_old = float(jax.jit(ssim_conv)(a, b))
        g_new = jax.jit(jax.grad(lambda x: ssim(x, b).astype(jnp.float32)))(a)
        g_old = jax.jit(jax.grad(
            lambda x: ssim_conv(x, b).astype(jnp.float32)))(a)
        gdiff = float(jnp.max(jnp.abs(
            g_new.astype(jnp.float32) - g_old.astype(jnp.float32))))
        gscale = float(jnp.max(jnp.abs(g_old.astype(jnp.float32))))

        so_new = jax.jit(sobel_magnitude)(a)
        so_old = jax.jit(sobel_conv)(a)
        sdiff = float(jnp.max(jnp.abs(
            so_new.astype(jnp.float32) - so_old.astype(jnp.float32))))

        print(f"{jnp.dtype(dtype).name}: ssim new {s_new:.6f} old "
              f"{s_old:.6f} | grad maxdiff {gdiff:.3e} (scale {gscale:.3e})"
              f" | sobel maxdiff {sdiff:.3e}", flush=True)


if __name__ == "__main__":
    main()
