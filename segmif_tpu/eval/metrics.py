"""Segmentation metrics: on-device confusion matrix + derived scores.

TPU-native replacement for sklearn.confusion_matrix
(/root/reference/val_performance.py:25,92) and the NumPy metric math of
/root/reference/utils/eval_seg.py:3-29 and /root/reference/util/util.py:31-55.
The histogram is a jnp bincount that runs on-device and accumulates across
batches without host syncs; the tiny derived-score math runs wherever.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(label_true: jnp.ndarray, label_pred: jnp.ndarray,
                     num_classes: int) -> jnp.ndarray:
    """[num_classes, num_classes] histogram; rows = true, cols = pred.

    Entries with label outside [0, num_classes) (e.g. ignore_index 255) are
    dropped, matching _fast_hist (/root/reference/utils/eval_seg.py:3-9).
    """
    t = label_true.reshape(-1).astype(jnp.int32)
    p = label_pred.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < num_classes)
    idx = jnp.where(valid, t * num_classes + jnp.clip(p, 0, num_classes - 1), num_classes * num_classes)
    hist = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return hist.reshape(num_classes, num_classes)


def scores(hist: np.ndarray) -> Dict:
    """Pixel acc / mean acc / mIoU / per-class IoU from a confusion matrix.

    Port of /root/reference/utils/eval_seg.py:11-29 (including the
    valid-row filter for mean IoU)."""
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        valid = hist.sum(axis=1) > 0
        mean_iu = np.nanmean(iu[valid])
    return {
        "Pixel Accuracy": acc,
        "Mean Accuracy": acc_cls,
        "Mean IoU": mean_iu,
        "Class IoU": dict(zip(range(hist.shape[0]), iu)),
    }


def compute_results(conf_total: np.ndarray):
    """(precision_per_class, recall_per_class, iou_per_class), NaN where a
    class is absent. Port of /root/reference/util/util.py:31-55 (class 0
    included)."""
    conf_total = np.asarray(conf_total, dtype=np.float64)
    n_class = conf_total.shape[0]
    precision = np.full(n_class, np.nan)
    recall = np.full(n_class, np.nan)
    iou = np.full(n_class, np.nan)
    for cid in range(n_class):
        col = conf_total[:, cid].sum()
        row = conf_total[cid, :].sum()
        tp = conf_total[cid, cid]
        if col != 0:
            precision[cid] = tp / col
        if row != 0:
            recall[cid] = tp / row
        denom = row + col - tp
        if denom != 0:
            iou[cid] = tp / denom
    return precision, recall, iou


MFNET_CLASS_NAMES = (
    "unlabeled", "car", "person", "bike", "curve", "car_stop", "guardrail",
    "color_cone", "bump",
)

# 9-class MFNet palette (RGB), see /root/reference/util/util.py:8-19.
MFNET_PALETTE = np.array(
    [
        (0, 0, 0),
        (64, 0, 128),
        (64, 64, 0),
        (0, 128, 192),
        (0, 0, 192),
        (128, 128, 0),
        (64, 64, 128),
        (192, 128, 128),
        (192, 64, 0),
    ],
    dtype=np.uint8,
)


def colorize_labels(label: np.ndarray, palette: np.ndarray = MFNET_PALETTE) -> np.ndarray:
    """Int label map [H, W] -> RGB uint8 [H, W, 3] via palette lookup."""
    label = np.clip(np.asarray(label, dtype=np.int64), 0, len(palette) - 1)
    return palette[label]
