"""Box/detection losses (parity with the reference's dormant detection block,
/root/reference/core/loss.py:38-339 — FCOS-style losses that no entry point
exercises; provided for API completeness, pure jnp).

Boxes are [..., 4] = (x_min, y_min, x_max, y_max).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays [..., 4] -> [...]."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0.0) * jnp.clip(a[..., 3] - a[..., 1], 0.0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0.0) * jnp.clip(b[..., 3] - b[..., 1], 0.0)
    union = area_a + area_b - inter
    return inter / (union + eps)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
             eps: float = 1e-7) -> jnp.ndarray:
    """-log(IoU), mean (loss.py:258-270 'iou' mode)."""
    return jnp.mean(-jnp.log(box_iou(pred, target, eps) + eps))


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray,
              eps: float = 1e-7) -> jnp.ndarray:
    """Generalized IoU loss 1 - GIoU, mean (loss.py:272-291 'giou' mode)."""
    iou = box_iou(pred, target, eps)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(pred[..., :2], target[..., :2])
    inter_rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0.0) * jnp.clip(pred[..., 3] - pred[..., 1], 0.0)
    area_t = jnp.clip(target[..., 2] - target[..., 0], 0.0) * jnp.clip(target[..., 3] - target[..., 1], 0.0)
    union = area_p + area_t - inter
    giou = iou - (hull - union) / (hull + eps)
    return jnp.mean(1.0 - giou)


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Binary focal loss on logits (the cls term of compute_cls_loss,
    loss.py:168-198). targets in {0, 1}, same shape as logits. Sum."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.logaddexp(0.0, logits) - logits * targets  # BCE with logits
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.sum(a_t * (1 - p_t) ** gamma * ce)


def centerness_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits on centerness targets over positive locations
    (compute_cnt_loss, loss.py:201-224)."""
    ce = jnp.logaddexp(0.0, logits) - logits * targets
    ce = jnp.where(mask, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(mask), 1)
