"""MFNet-legacy augmentation callables (parity with
/root/reference/util/augmentation.py:6-92 — not used by any reference entry
point, provided for API completeness). Pure jnp, key-explicit, NHWC.

Each function takes (key, image [H,W,C] float [0,255], label [H,W] int) and
returns the augmented pair.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_flip(key, image, label, prob: float = 0.5):
    do = jax.random.bernoulli(key, prob)
    return (jnp.where(do, image[:, ::-1], image),
            jnp.where(do, label[:, ::-1], label))


def random_crop(key, image, label, crop_rate: float = 0.1):
    """Crop a random margin (up to crop_rate per side) and resize back."""
    h, w = label.shape
    ks = jax.random.split(key, 4)
    top = (jax.random.uniform(ks[0]) * crop_rate * h)
    left = (jax.random.uniform(ks[1]) * crop_rate * w)
    bottom = h - jax.random.uniform(ks[2]) * crop_rate * h
    right = w - jax.random.uniform(ks[3]) * crop_rate * w
    rows = top + (bottom - top) * (jnp.arange(h) + 0.5) / h - 0.5
    cols = left + (right - left) * (jnp.arange(w) + 0.5) / w - 0.5
    ri = jnp.clip(jnp.round(rows).astype(jnp.int32), 0, h - 1)
    ci = jnp.clip(jnp.round(cols).astype(jnp.int32), 0, w - 1)
    return image[ri][:, ci], label[ri][:, ci]


def random_crop_out(key, image, label, crop_rate: float = 0.2):
    """Zero out a random rectangle (cutout)."""
    h, w = label.shape
    ks = jax.random.split(key, 4)
    ch = (jax.random.uniform(ks[0]) * crop_rate + 0.05) * h
    cw = (jax.random.uniform(ks[1]) * crop_rate + 0.05) * w
    cy = jax.random.uniform(ks[2]) * (h - ch)
    cx = jax.random.uniform(ks[3]) * (w - cw)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inside = ((yy >= cy) & (yy < cy + ch) & (xx >= cx) & (xx < cx + cw))
    return jnp.where(inside[..., None], 0.0, image), label


def random_brightness(key, image, label, bright_range: float = 0.15,
                      prob: float = 0.9):
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, prob)
    factor = 1.0 + jax.random.uniform(k2, (), minval=-bright_range,
                                      maxval=bright_range)
    out = jnp.clip(image * jnp.where(do, factor, 1.0), 0, 255)
    return out, label


def random_noise(key, image, label, noise_range: float = 5.0,
                 prob: float = 0.9):
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, prob)
    noise = jax.random.uniform(k2, image.shape, minval=-noise_range,
                               maxval=noise_range)
    out = jnp.clip(image + jnp.where(do, noise, 0.0), 0, 255)
    return out, label


def random_flipud(key, image, label, prob: float = 0.5):
    """Vertical flip (parity with random_flipud,
    /root/reference/datasets/imutils.py:134-140 — unused by reference entry
    points)."""
    do = jax.random.bernoulli(key, prob)
    return (jnp.where(do, image[::-1], image),
            jnp.where(do, label[::-1], label))


def random_rot(key, image, label):
    """Random 90-degree rotation, k uniform in {1, 2, 3} (parity with
    random_rot, /root/reference/datasets/imutils.py:142-148). Requires a
    SQUARE image under jit (k=1/3 transpose the spatial dims — only a
    static shape if H == W; the reference applies it to square crops)."""
    assert image.shape[0] == image.shape[1], "random_rot needs H == W"
    k = jax.random.randint(key, (), 1, 4)
    branches = [lambda t, i=i: jnp.rot90(t, i) for i in (1, 2, 3)]
    return (jax.lax.switch(k - 1, branches, image),
            jax.lax.switch(k - 1, branches, label))
