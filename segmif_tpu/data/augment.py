"""Device-side, jit-compiled augmentation pipeline.

The reference augments on CPU worker processes with PIL/numpy
(/root/reference/datasets/imutils.py): random scale 0.5-2.0 (bilinear img /
nearest label, :34-90), random joint flip (:116-127), mean-RGB-padded random
crop with a 10-try class-balance rejection (cat_max_ratio=0.75, :199-249),
and PhotoMetricDistortion on the visible image only (brightness +-32,
contrast/saturation 0.5-1.5, hue +-18 in HSV, :295-391).

Here augmentation is a single XLA program on device ("jit-compiled TPU
preprocessing", BASELINE.json north star). Scale + flip + pad + crop are
fused into ONE bilinear warp gather with static output shapes — no
variable-size intermediates, no recompilation across scales:

    dst pixel i  ->  src coord (flip applied)  via  (o + i + 0.5)/s - 0.5

with out-of-bounds filled by mean-RGB (images) / ignore_index (labels).
The class-balance rejection evaluates all 10 candidate offsets in one
vectorized pass and selects the first acceptable one with lax arithmetic.

All randomness is explicit jax.random keys; batching is vmap over per-sample
keys.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugConfig(NamedTuple):
    crop_size: int = 320
    scale_min: float = 0.5
    scale_max: float = 2.0
    flip_prob: float = 0.5
    cat_max_ratio: float = 0.75
    crop_tries: int = 10
    ignore_index: int = 255
    brightness_delta: float = 32.0
    contrast_range: tuple = (0.5, 1.5)
    saturation_range: tuple = (0.5, 1.5)
    hue_delta: float = 18.0


# ------------------------------------------------------------------ warp ----

def _warp_coords(crop: int, scale, off_h, off_w, flip, src_h: int, src_w: int):
    """Source sampling coordinates [crop] x [crop] for the fused
    scale->flip->crop transform."""
    i = jnp.arange(crop, dtype=jnp.float32)
    rows = (off_h + i + 0.5) / scale - 0.5
    cols = (off_w + i + 0.5) / scale - 0.5
    # horizontal flip: mirror the source column coordinate
    cols = jnp.where(flip, (src_w - 1) - cols, cols)
    return rows, cols


def _gather_bilinear(img: jnp.ndarray, rows, cols, fill: jnp.ndarray):
    """img: [H, W, C]; rows/cols: [crop]. Bilinear sample with constant fill
    outside the source extent. Separable gathers (rows then cols) keep this
    a pair of cheap take-along ops on TPU."""
    h, w, _ = img.shape
    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = (rows - r0)[:, None, None]
    fc = (cols - c0)[None, :, None]
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)

    def take(r_idx, c_idx):
        rcl = jnp.clip(r_idx, 0, h - 1)
        ccl = jnp.clip(c_idx, 0, w - 1)
        return img[rcl][:, ccl]

    v00 = take(r0i, c0i)
    v01 = take(r0i, c0i + 1)
    v10 = take(r0i + 1, c0i)
    v11 = take(r0i + 1, c0i + 1)
    out = ((1 - fr) * (1 - fc) * v00 + (1 - fr) * fc * v01
           + fr * (1 - fc) * v10 + fr * fc * v11)
    inside = ((rows >= -0.5) & (rows <= h - 0.5))[:, None, None] & \
             ((cols >= -0.5) & (cols <= w - 0.5))[None, :, None]
    return jnp.where(inside, out, fill)


def _gather_nearest(lab: jnp.ndarray, rows, cols, fill_value: int):
    """lab: [H, W] int; nearest sample with constant fill."""
    h, w = lab.shape
    ri = jnp.round(rows).astype(jnp.int32)
    ci = jnp.round(cols).astype(jnp.int32)
    out = lab[jnp.clip(ri, 0, h - 1)][:, jnp.clip(ci, 0, w - 1)]
    inside = ((ri >= 0) & (ri <= h - 1))[:, None] & \
             ((ci >= 0) & (ci <= w - 1))[None, :]
    return jnp.where(inside, out, fill_value)


# -------------------------------------------------------- crop selection ----

def _pick_crop_offsets(key, lab, scale, flip, cfg: AugConfig,
                       num_classes: int):
    """Evaluate cfg.crop_tries candidate crop offsets on the label map and
    return the first whose dominant-class ratio < cat_max_ratio (else the
    last), mirroring get_random_cropbox (imutils.py:170-187)."""
    src_h, src_w = lab.shape
    scaled_h = scale * src_h
    scaled_w = scale * src_w
    # when the scaled image is smaller than the crop this range is negative,
    # which randomly places the image inside the padded canvas — the same
    # effect as the reference's random pad offset (imutils.py:165-166)
    max_off_h = scaled_h - cfg.crop_size
    max_off_w = scaled_w - cfg.crop_size
    k1, k2 = jax.random.split(key)
    offs_h = jax.random.uniform(k1, (cfg.crop_tries,)) * max_off_h
    offs_w = jax.random.uniform(k2, (cfg.crop_tries,)) * max_off_w

    def ratio_of(off_h, off_w):
        rows, cols = _warp_coords(cfg.crop_size, scale, off_h, off_w, flip,
                                  src_h, src_w)
        crop = _gather_nearest(lab, rows, cols, cfg.ignore_index)
        valid = crop != cfg.ignore_index
        idx = jnp.where(valid, crop, num_classes)
        cnt = jnp.bincount(idx.reshape(-1).astype(jnp.int32),
                           length=num_classes + 1)[:-1]
        total = jnp.maximum(jnp.sum(cnt), 1)
        return jnp.max(cnt) / total

    ratios = jax.vmap(ratio_of)(offs_h, offs_w)
    ok = ratios < cfg.cat_max_ratio
    # first acceptable index, else the last candidate
    first_ok = jnp.argmax(ok)
    pick = jnp.where(jnp.any(ok), first_ok, cfg.crop_tries - 1)
    return offs_h[pick], offs_w[pick]


# ----------------------------------------------------------- photometric ----

def _rgb_to_hsv(rgb):
    """[H,W,3] in [0,255] -> (h in [0,360), s in [0,1], v in [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d == 0, 0.0, h * 60.0)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    conds = [
        (hp < 1, (c, x, z)), (hp < 2, (x, c, z)), (hp < 3, (z, c, x)),
        (hp < 4, (z, x, c)), (hp < 5, (x, z, c)), (hp >= 5, (c, z, x)),
    ]
    r = g = b = z
    done = jnp.zeros_like(c, dtype=bool)
    for cond, (rr, gg, bb) in conds:
        use = cond & ~done
        r = jnp.where(use, rr, r)
        g = jnp.where(use, gg, g)
        b = jnp.where(use, bb, b)
        done = done | cond
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def photometric_distortion(key, img255: jnp.ndarray, cfg: AugConfig):
    """mmseg-style photometric jitter on a [H,W,3] image in [0,255].

    Same op set and coin-flip structure as the reference (imutils.py:295-381):
    brightness, contrast (before or after color ops), saturation, hue. Runs
    in float throughout (the reference round-trips uint8; <1/255 difference).
    """
    keys = jax.random.split(key, 9)

    def coin(k):
        return jax.random.bernoulli(k)

    img = img255
    beta = jax.random.uniform(keys[1], (), minval=-cfg.brightness_delta,
                              maxval=cfg.brightness_delta)
    img = jnp.where(coin(keys[0]), jnp.clip(img + beta, 0, 255), img)

    alpha = jax.random.uniform(keys[3], (), minval=cfg.contrast_range[0],
                               maxval=cfg.contrast_range[1])
    contrasted = jnp.clip(img * alpha, 0, 255)
    mode = coin(keys[8])
    do_contrast = coin(keys[2])
    img = jnp.where(mode & do_contrast, contrasted, img)

    h, s, v = _rgb_to_hsv(img)
    sat = jax.random.uniform(keys[5], (), minval=cfg.saturation_range[0],
                             maxval=cfg.saturation_range[1])
    s = jnp.where(coin(keys[4]), jnp.clip(s * sat, 0.0, 1.0), s)
    hue = jax.random.uniform(keys[7], (), minval=-cfg.hue_delta,
                             maxval=cfg.hue_delta)
    h = jnp.where(coin(keys[6]), (h + hue * 2.0) % 360.0, h)
    img = _hsv_to_rgb(h, s, v)

    contrasted = jnp.clip(img * alpha, 0, 255)
    img = jnp.where((~mode) & do_contrast, contrasted, img)
    return jnp.clip(img, 0.0, 255.0)


# ------------------------------------------------------------- full aug ----

@functools.partial(jax.jit, static_argnames=("cfg", "num_classes"))
def augment_sample(key, ir, vis, guide, label, cfg: AugConfig,
                   num_classes: int):
    """One training sample -> cropped/augmented tensors.

    ir/vis/guide: [H, W, 3] float in [0,255]; label: [H, W] int32.
    Returns dict with 'ir' [C,C,1], 'vis'/'guide' [C,C,3] in [0,1],
    'label' [C,C] int32.
    """
    ir = ir.astype(jnp.float32)
    vis = vis.astype(jnp.float32)
    guide = guide.astype(jnp.float32)
    k_scale, k_flip, k_crop, k_photo = jax.random.split(key, 4)
    scale = jax.random.uniform(k_scale, (), minval=cfg.scale_min,
                               maxval=cfg.scale_max)
    flip = jax.random.bernoulli(k_flip, cfg.flip_prob)
    off_h, off_w = _pick_crop_offsets(k_crop, label, scale, flip, cfg,
                                      num_classes)
    src_h, src_w = label.shape
    rows, cols = _warp_coords(cfg.crop_size, scale, off_h, off_w, flip,
                              src_h, src_w)

    vis = photometric_distortion(k_photo, vis, cfg)
    mean_rgb = jnp.zeros((3,), vis.dtype)  # reference passes mean_rgb=[0,0,0]
    out = {}
    out["ir"] = _gather_bilinear(ir, rows, cols, mean_rgb)[..., 0:1] / 255.0
    out["vis"] = _gather_bilinear(vis, rows, cols, mean_rgb) / 255.0
    out["guide"] = _gather_bilinear(guide, rows, cols, mean_rgb) / 255.0
    out["label"] = _gather_nearest(label, rows, cols,
                                   cfg.ignore_index).astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "num_classes"))
def augment_batch(key, ir, vis, guide, label, cfg: AugConfig,
                  num_classes: int):
    """Batched augmentation: [B, H, W, ...] inputs, per-sample keys."""
    keys = jax.random.split(key, ir.shape[0])
    return jax.vmap(lambda k, a, b, c, d: augment_sample(
        k, a, b, c, d, cfg, num_classes))(keys, ir, vis, guide, label)
