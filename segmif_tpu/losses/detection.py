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


def coords_fmap(h: int, w: int, stride: int) -> jnp.ndarray:
    """Feature-map cell centers in original-image coordinates, [h*w, 2] as
    (x, y) (coords_fmap2orig, /root/reference/core/loss.py:18-37)."""
    xs = jnp.arange(w, dtype=jnp.float32) * stride
    ys = jnp.arange(h, dtype=jnp.float32) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1) + stride // 2


def gen_level_targets(shape_hw, gt_boxes: jnp.ndarray, classes: jnp.ndarray,
                      stride: int, limit_range,
                      sample_radiu_ratio: float = 1.5):
    """FCOS target assignment for one FPN level (GenTargets._gen_level_targets,
    /root/reference/core/loss.py:77-165), fully vectorized for XLA: the
    boolean-scatter row selection becomes argmin + take_along_axis.

    shape_hw: static (h, w) of the level's feature map.
    gt_boxes: [B, m, 4] (x1, y1, x2, y2); classes: [B, m] int.
    Returns (cls_targets [B, hw, 1], cnt_targets [B, hw, 1],
             reg_targets [B, hw, 4]); negatives get 0 / -1 / -1.
    """
    h, w = shape_hw
    coords = coords_fmap(h, w, stride)          # [hw, 2]
    x = coords[:, 0][None, :, None]             # [1, hw, 1]
    y = coords[:, 1][None, :, None]

    l_off = x - gt_boxes[..., 0][:, None, :]    # [B, hw, m]
    t_off = y - gt_boxes[..., 1][:, None, :]
    r_off = gt_boxes[..., 2][:, None, :] - x
    b_off = gt_boxes[..., 3][:, None, :] - y
    ltrb = jnp.stack([l_off, t_off, r_off, b_off], -1)   # [B, hw, m, 4]

    areas = (ltrb[..., 0] + ltrb[..., 2]) * (ltrb[..., 1] + ltrb[..., 3])
    off_min = jnp.min(ltrb, -1)
    off_max = jnp.max(ltrb, -1)
    in_box = off_min > 0
    in_level = (off_max > limit_range[0]) & (off_max <= limit_range[1])

    radiu = stride * sample_radiu_ratio
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
    c_off = jnp.stack([x - cx[:, None, :], y - cy[:, None, :],
                       cx[:, None, :] - x, cy[:, None, :] - y], -1)
    near_center = jnp.max(c_off, -1) < radiu

    mask_pos = in_box & in_level & near_center           # [B, hw, m]
    areas = jnp.where(mask_pos, areas, 99999999.0)
    best = jnp.argmin(areas, -1)                         # [B, hw]

    take = lambda t: jnp.take_along_axis(  # noqa: E731
        t, best[..., None, None], axis=2)[:, :, 0]
    reg_targets = take(ltrb)                             # [B, hw, 4]
    cls_targets = jnp.take_along_axis(
        jnp.broadcast_to(classes[:, None, :], areas.shape).astype(jnp.int32),
        best[..., None], axis=2)                         # [B, hw, 1]

    lr_min = jnp.minimum(reg_targets[..., 0], reg_targets[..., 2])
    lr_max = jnp.maximum(reg_targets[..., 0], reg_targets[..., 2])
    tb_min = jnp.minimum(reg_targets[..., 1], reg_targets[..., 3])
    tb_max = jnp.maximum(reg_targets[..., 1], reg_targets[..., 3])
    cnt_targets = jnp.sqrt(jnp.clip(
        (lr_min * tb_min) / (lr_max * tb_max + 1e-10), 0.0))[..., None]

    any_pos = jnp.any(mask_pos, -1)                      # [B, hw]
    cls_targets = jnp.where(any_pos[..., None], cls_targets, 0)
    cnt_targets = jnp.where(any_pos[..., None], cnt_targets, -1.0)
    reg_targets = jnp.where(any_pos[..., None], reg_targets, -1.0)
    return cls_targets, cnt_targets, reg_targets


def gen_targets(level_shapes, gt_boxes: jnp.ndarray, classes: jnp.ndarray,
                strides, limit_ranges, sample_radiu_ratio: float = 1.5):
    """Multi-level FCOS targets (GenTargets.forward,
    /root/reference/core/loss.py:38-76), concatenated over levels.

    level_shapes: static [(h, w), ...] per FPN level (the reference derives
    them from the logits; static shapes keep this jittable)."""
    outs = [gen_level_targets(s, gt_boxes, classes, st, lr,
                              sample_radiu_ratio)
            for s, st, lr in zip(level_shapes, strides, limit_ranges)]
    cls_t = jnp.concatenate([o[0] for o in outs], 1)
    cnt_t = jnp.concatenate([o[1] for o in outs], 1)
    reg_t = jnp.concatenate([o[2] for o in outs], 1)
    return cls_t, cnt_t, reg_t
