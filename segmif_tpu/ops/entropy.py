"""Differentiable patch entropy via soft (KDE) histograms. NHWC, pure jnp.

Replaces /root/reference/core/Entropy.py: unfold the image into non-overlapping
psize x psize patches, estimate a per-patch pdf over `bins` points in [0,1]
with a Gaussian kernel (sigma), and sum -p*log(p).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("patch_size", "num_bins"))
def patch_entropy(x: jnp.ndarray, patch_size: int = 4, num_bins: int = 32,
                  sigma: float = 0.01) -> jnp.ndarray:
    """x: [N, H, W, 1] (or [N, H, W, C] treated channel-joint per reference's
    single-channel usage). Returns scalar total entropy.

    H and W must be divisible by patch_size (the reference's Unfold silently
    drops remainders; we require exact tiling for static shapes).
    """
    n, h, w, c = x.shape
    ph = h // patch_size
    pw = w // patch_size
    x = x[:, : ph * patch_size, : pw * patch_size, :]
    # [N, ph, ps, pw, ps, C] -> [N*ph*pw, ps*ps*C]
    patches = x.reshape(n, ph, patch_size, pw, patch_size, c)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        n * ph * pw, patch_size * patch_size * c
    )
    bins = jnp.linspace(0.0, 1.0, num_bins, dtype=x.dtype)
    residuals = patches[:, :, None] - bins[None, None, :]
    kernel = jnp.exp(-0.5 * (residuals / sigma) ** 2)
    pdf = jnp.mean(kernel, axis=1)  # [P, bins]
    # The reference uses eps=1e-40, which is subnormal in fp32 and flushed to
    # zero by XLA:TPU (log(0) -> -inf -> NaN); 1e-12 keeps the same semantics
    # in normalized fp32 range.
    eps = 1e-12
    pdf = pdf / (jnp.sum(pdf, axis=1, keepdims=True) + eps) + eps
    ent = -jnp.sum(pdf * jnp.log(pdf), axis=1)
    return jnp.sum(ent)
