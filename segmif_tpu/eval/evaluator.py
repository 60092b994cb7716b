"""Evaluation drivers: segmentation mIoU eval and fused-image generation.

TPU-native equivalents of /root/reference/val_performance.py:

 - segmentation_eval  <- val_segformer / val_segformer2 / val_segformer_fused
   (:45-382): run the seg model over a dataset of RGB images, accumulate a
   CxC confusion matrix ON DEVICE (one bincount per batch, no per-image
   host sync), derive per-class precision/IoU + mIoU.
 - generate_fused     <- val_fusion / val_fusion_train (:384-466,637-716):
   fuse every (ir, vis) pair using seg-encoder taps from a guide image, and
   hand the results over IN MEMORY (optionally also dumped as PNGs — the
   reference's only transport was the filesystem).
 - fusion_quality_eval: SSIM / MSE of fused-Y vs guide-Y, the train-time
   fidelity metric of BASELINE.md.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..data.pipeline import iterate_eval
from ..ops.color import rgb_to_ycrcb
from ..ops.ssim import ssim
from .image_io import write_fused_batch
from .metrics import compute_results, confusion_matrix, scores


def segmentation_eval(segment_fn: Callable, variables, dataset,
                      num_classes: int, batch_size: int = 4,
                      log_file: Optional[str] = None,
                      tag: str = "") -> Dict:
    """dataset yields (name, image_rgb255 [H,W,3], label) triples (e.g.
    MethodFolderDataset) OR (name, ir, vis, guide, label) 5-tuples where the
    GUIDE (fused) image is segmented, matching val_segformer's use of the
    Mask/ dir."""
    conf = jnp.zeros((num_classes, num_classes), jnp.int32)
    for names, count, arrays in iterate_eval(dataset, batch_size):
        if len(arrays) == 2:
            imgs, labels = arrays
        else:  # 5-tuple layout: ir, vis, guide, label
            imgs, labels = arrays[2], arrays[3]
        imgs = jnp.asarray(imgs).astype(jnp.float32) / 255.0
        pred = segment_fn(variables, imgs)
        labels = jnp.asarray(labels)
        conf = conf + confusion_matrix(labels[:count], pred[:count],
                                       num_classes)
    conf = np.asarray(conf)
    s = scores(conf)
    precision, recall, iou = compute_results(conf)
    result = {
        "mIoU": float(s["Mean IoU"]),
        "pixel_acc": float(s["Pixel Accuracy"]),
        "mean_acc": float(s["Mean Accuracy"]),
        "precision": precision,
        "recall": recall,
        "iou": iou,
        "confusion": conf,
    }
    if log_file:
        _append_eval_log(log_file, tag, result)
    return result


def _append_eval_log(path: str, tag: str, result: Dict) -> None:
    """Append a per-class precision/IoU table, like the running txt logs
    (val_performance.py:209,288-294)."""
    with open(path, "a") as f:
        f.write(f"== {tag} ==\n")
        for c, (p, i) in enumerate(zip(result["precision"], result["iou"])):
            f.write(f"class {c}: precision {p:.4f} iou {i:.4f}\n")
        f.write(f"mIoU {result['mIoU']:.4f} acc {result['pixel_acc']:.4f}\n")


def generate_fused(fuse_fn: Callable, variables, dataset,
                   batch_size: int = 4, out_dir: Optional[str | Path] = None,
                   quantize_like_reference: bool = False,
                   sink: Optional[Callable] = None):
    """Fuse a whole dataset. dataset yields (name, ir, vis, guide, label).

    Returns (names, fused_rgb01 [N,H,W,3] float32 np, labels [N,H,W] int32).
    If out_dir is set, also writes PNGs (the reference's Mask/ dump,
    val_performance.py:461-466).

    sink (optional): `sink(start, fused_np, guide_np)` called per batch
    (fused/guide both [b,H,W,3] float01, `start` the dataset index of the
    batch's first sample) INSTEAD of accumulating — the streaming trainer's
    constant-RAM path; the returned fused array is then None."""
    all_names, all_fused, all_labels = [], [], []
    start = 0
    for names, count, (ir, vis, guide, label) in iterate_eval(dataset,
                                                              batch_size):
        ir_y = jnp.asarray(ir[..., 0:1]).astype(jnp.float32) / 255.0
        vis_j = jnp.asarray(vis).astype(jnp.float32) / 255.0
        guide_j = jnp.asarray(guide).astype(jnp.float32) / 255.0
        fused_rgb, _ = fuse_fn(variables, ir_y, vis_j, guide_j)
        fused_np = np.asarray(fused_rgb[:count], np.float32)
        if out_dir is not None:
            write_fused_batch(out_dir, names, fused_np,
                              quantize_like_reference)
        all_names.extend(names)
        if sink is not None:
            sink(start, fused_np, np.asarray(guide_j[:count], np.float32))
        else:
            all_fused.append(fused_np)
        if label is not None:
            all_labels.append(np.asarray(label[:count], np.int32))
        start += count
    fused = (np.concatenate(all_fused) if all_fused
             else None if sink is not None else np.zeros((0,)))
    labels = np.concatenate(all_labels) if all_labels else None
    return all_names, fused, labels


def fusion_quality_eval(fused_rgb01: np.ndarray,
                        guide_rgb01: np.ndarray) -> Dict:
    """SSIM + MSE of the fused Y channel vs the guide Y channel (the
    Fusionloss_grad3 fidelity terms, /root/reference/core/loss.py:506-517)."""
    fy = rgb_to_ycrcb(jnp.asarray(fused_rgb01))[..., 0:1]
    gy = rgb_to_ycrcb(jnp.asarray(guide_rgb01))[..., 0:1]
    return {
        "ssim": float(ssim(fy, gy)),
        "mse": float(jnp.mean((fy - gy) ** 2)),
    }
