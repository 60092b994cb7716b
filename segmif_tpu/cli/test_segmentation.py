"""CLI: segmentation eval over a directory of (fused) images.

Reference-compatible role (/root/reference/test_segmentation.py): load the
seg checkpoint, segment every image of --fused_dir, print the per-class
precision/IoU table and mIoU (the val_segformer2 protocol,
val_performance.py:296-382).

    python -m segmif_tpu.cli.test_segmentation --fused_dir ./Fused_images \
        --label_dir ./test_all/Label --checkpoint_dir ./checkpoint
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fused_dir", required=True)
    p.add_argument("--label_dir", required=True)
    p.add_argument("--checkpoint_dir", default="./checkpoint")
    p.add_argument("--torch_seg_ckpt", default=None)
    p.add_argument("--backbone", default="mit_b3")
    p.add_argument("--num_classes", type=int, default=9)
    p.add_argument("-B", "--batch_size", type=int, default=4)
    p.add_argument("--log_file", default="val_seg.txt")
    args = p.parse_args(argv)

    from ..utils.platform import honor_platform_env

    honor_platform_env()

    import jax

    from ..data.datasets import MethodFolderDataset
    from ..eval.evaluator import segmentation_eval
    from ..eval.metrics import MFNET_CLASS_NAMES
    from ..train.steps import make_segment_fn
    from .test_fusion import build_model_and_variables

    model, variables = build_model_and_variables(
        args.backbone, args.num_classes, args.checkpoint_dir,
        torch_seg_ckpt=args.torch_seg_ckpt)
    ds = MethodFolderDataset(args.fused_dir, args.label_dir)
    segment_fn = jax.jit(make_segment_fn(model))
    res = segmentation_eval(segment_fn, variables, ds, args.num_classes,
                            args.batch_size, log_file=args.log_file,
                            tag=args.fused_dir)
    names = (MFNET_CLASS_NAMES if args.num_classes == len(MFNET_CLASS_NAMES)
             else [f"class{i}" for i in range(args.num_classes)])
    print(f"{'class':<12} {'precision':>10} {'iou':>10}")
    for i, n in enumerate(names):
        prec = res["precision"][i]
        iou = res["iou"][i]
        print(f"{n:<12} {prec:>10.4f} {iou:>10.4f}")
    print(f"mIoU {res['mIoU']:.4f}  pixel_acc {res['pixel_acc']:.4f}")
    return res


if __name__ == "__main__":
    main()
