"""CLI: interactive fusion<->segmentation training.

Reference-compatible invocation (/root/reference/train.py:416-435):

    python -m segmif_tpu.cli.train --config configs/fmb.yaml \
        --configf configs/fmb_fusion.yaml

With --synthetic N, trains on procedurally generated data (for smoke runs in
environments without the FMB/MFNet datasets).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="seg-task YAML")
    p.add_argument("--configf", default=None, help="fusion-task YAML")
    p.add_argument("--backbone", default=None)
    p.add_argument("--rounds", type=int, default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--val_root", default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic samples instead of real data")
    p.add_argument("--synthetic_size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--fusion_iters", type=int, default=None)
    p.add_argument("--seg_iters", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=None,
                   help="override crop size for BOTH phases (e.g. for small "
                        "synthetic images)")
    p.add_argument("--start_round", type=int, default=1,
                   help="resume from this round (loads checkpoints)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/fusion blocks in training "
                        "(recompute-for-HBM; for full-res large batches)")
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--streaming", action="store_true",
                   help="don't stack splits into host RAM (decode per batch;"
                        " fused images in a disk memmap) — for datasets "
                        "larger than FMB/MFNet scale")
    p.add_argument("--fusion_chunk", type=int, default=None,
                   help="fusion-phase iters per device dispatch (>1 scans "
                        "augment+step in one compiled call; identical math, "
                        "amortizes dispatch latency)")
    p.add_argument("--compute_dtype", default=None,
                   choices=("bfloat16", "float32"),
                   help="activation dtype; default bfloat16 on TPU, float32 "
                        "on CPU (jax>=0.9 CPU backend cannot execute "
                        "bf16xbf16 dots)")
    args = p.parse_args(argv)

    from ..utils.platform import honor_platform_env

    honor_platform_env()
    import jax

    from ..config import TrainConfig, load_yaml
    from ..data.datasets import FusionFolderDataset, SyntheticFusionDataset
    from ..train.interactive import InteractiveTrainer
    from ..utils.logging import setup_logger

    if args.config:
        cfg = load_yaml(args.config, args.configf)
    else:
        cfg = TrainConfig()
    if args.backbone:
        cfg.backbone = args.backbone
    if args.rounds:
        cfg.rounds = args.rounds
    if args.data_root:
        cfg.data.root_dir = args.data_root
    if args.val_root:
        cfg.data.val_root_dir = args.val_root
    if args.checkpoint_dir:
        cfg.checkpoint_dir = args.checkpoint_dir
    if args.fusion_iters:
        cfg.fusion.iters_round1 = cfg.fusion.iters_later = args.fusion_iters
    if args.seg_iters:
        cfg.seg.iters = args.seg_iters
    if args.crop_size:
        cfg.fusion.crop_size = args.crop_size
        cfg.data.crop_size = args.crop_size
    if args.fusion_chunk:
        cfg.fusion.train_chunk = args.fusion_chunk
    if args.remat:
        cfg.remat = True
    if args.streaming:
        cfg.streaming = True
    if args.compute_dtype:
        cfg.compute_dtype = args.compute_dtype
    elif jax.default_backend() == "cpu" and cfg.compute_dtype == "bfloat16":
        cfg.compute_dtype = "float32"
    cfg.mesh_data = args.mesh_data
    cfg.mesh_model = args.mesh_model

    logger = setup_logger("train.log")
    if args.synthetic:
        size = tuple(args.synthetic_size)
        train_ds = SyntheticFusionDataset(args.synthetic, size,
                                          cfg.data.num_classes, seed=0)
        val_ds = SyntheticFusionDataset(max(args.synthetic // 4, 1), size,
                                        cfg.data.num_classes, seed=1)
    else:
        train_ds = FusionFolderDataset(
            cfg.data.root_dir, ir_dir=cfg.data.ir_dir,
            vis_dir=cfg.data.vis_dir, guide_dir=cfg.data.guide_dir,
            label_dir=cfg.data.label_dir)
        val_ds = FusionFolderDataset(
            cfg.data.val_root_dir, ir_dir=cfg.data.ir_dir,
            vis_dir=cfg.data.vis_dir, guide_dir=cfg.data.guide_dir,
            label_dir=cfg.data.label_dir)

    trainer = InteractiveTrainer(cfg, train_ds, val_ds, logger=logger)
    result = trainer.run(start_round=args.start_round)
    logger.info("training complete: best mIoU %.4f", result["best_mIoU"])
    return result


if __name__ == "__main__":
    main()
