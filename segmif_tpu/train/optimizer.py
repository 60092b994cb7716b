"""Optimizer: AdamW with poly-warmup schedule and reference-style param groups.

Replaces /root/reference/utils/optimizer.py (PolyWarmupAdamW / _seg) with an
optax chain. The schedule at step t:

    t < warmup_iter:  lr * (1 - (1 - t/warmup_iter) * (1 - warmup_ratio))
    t < max_iter:     lr * (1 - t/max_iter) ** power
    t >= max_iter:    frozen at the last poly value (the reference stops
                      updating lr past max_iter)

Param groups mirror WeTr.get_param_groups
(/root/reference/core/model_fusion.py:44-60) + train.py:173-200:
 group 0: encoder non-norm params     (lr,    wd)
 group 1: encoder norm/bias params    (lr,    wd=0)
 group 2: decoder + classifier params (lr*10, wd)
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def poly_warmup_schedule(base_lr: float, warmup_iter: int, max_iter: int,
                         warmup_ratio: float = 1e-6, power: float = 1.0,
                         start_step: int = 0) -> Callable:
    """Returns an optax schedule fn. `start_step` offsets the step count,
    matching PolyWarmupAdamW_seg's `iter_curr` resume semantics
    (/root/reference/utils/optimizer.py:41)."""

    def schedule(count):
        t = count + start_step
        warm = 1.0 - (1.0 - t / jnp.maximum(warmup_iter, 1)) * (1.0 - warmup_ratio)
        tp = jnp.minimum(t, max_iter - 1)
        poly = (1.0 - tp / max_iter) ** power
        mult = jnp.where(t < warmup_iter, warm, poly)
        return base_lr * mult

    return schedule


def adamw_poly(base_lr: float, warmup_iter: int, max_iter: int,
               weight_decay: float = 0.01, betas=(0.9, 0.999),
               warmup_ratio: float = 1e-6, power: float = 1.0,
               start_step: int = 0) -> optax.GradientTransformation:
    """Single-group poly-warmup AdamW (fusion-phase optimizer,
    /root/reference/train.py:316-332)."""
    return optax.adamw(
        learning_rate=poly_warmup_schedule(base_lr, warmup_iter, max_iter,
                                           warmup_ratio, power, start_step),
        b1=betas[0], b2=betas[1], eps=1e-8, weight_decay=weight_decay,
    )


def _is_norm_or_bias(path: tuple) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(k) for k in keys).lower()
    if joined.endswith("/bias") or joined.endswith("/b"):
        return True
    return any(("norm" in str(k).lower() or str(k) == "bn") for k in keys)


def seg_param_labels(params: Any) -> Any:
    """Label tree for the 3 seg param groups: 'encoder', 'encoder_norm',
    'decoder'."""

    def label(path, _leaf):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        in_encoder = any("encoder" in k for k in keys)
        if in_encoder:
            return "encoder_norm" if _is_norm_or_bias(path) else "encoder"
        return "decoder"

    return jax.tree_util.tree_map_with_path(label, params)


def adamw_poly_grouped(params: Any, base_lr: float, warmup_iter: int,
                       max_iter: int, weight_decay: float = 0.01,
                       betas=(0.9, 0.999), warmup_ratio: float = 1e-6,
                       power: float = 1.0, start_step: int = 0,
                       decoder_lr_mult: float = 10.0
                       ) -> optax.GradientTransformation:
    """3-group poly-warmup AdamW for the segmentation phase
    (/root/reference/train.py:173-200)."""

    def group(lr_mult, wd):
        return optax.adamw(
            learning_rate=poly_warmup_schedule(base_lr * lr_mult, warmup_iter,
                                               max_iter, warmup_ratio, power,
                                               start_step),
            b1=betas[0], b2=betas[1], eps=1e-8, weight_decay=wd,
        )

    return optax.multi_transform(
        {
            "encoder": group(1.0, weight_decay),
            "encoder_norm": group(1.0, 0.0),
            "decoder": group(decoder_lr_mult, weight_decay),
        },
        seg_param_labels(params),
    )
