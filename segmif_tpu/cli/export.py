"""CLI: export a serving artifact (portable StableHLO) from checkpoints.

The reference's deployment path is "re-run test_fusion.py with the repo and
the .pth files on the box" (/root/reference/test_fusion.py:173-188). This
exports the WHOLE inference pipeline — guide taps, fusion net, YCrCb
recombination, segmentation, class-map upsampling — as one self-contained
artifact that any jax process can run without this package or the
checkpoints:

    python -m segmif_tpu.cli.export \
        --torch_fusion_ckpt checkpoint/modelfusion-final2.pth \
        --torch_seg_ckpt checkpoint/model-fusion_add_final2.pth \
        --out segmif_serve.stablehlo \
        --batch 8 --height 480 --width 640 \
        --static_guide guide.png --platforms tpu,cpu

Load side (no segmif_tpu needed):

    from jax import export
    fn = export.deserialize(bytearray(open(p,'rb').read())).call
    fused_rgb, pred = fn(ir, vis)
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--backbone", default="mit_b3")
    p.add_argument("--num_classes", type=int, default=9)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--torch_fusion_ckpt", default=None)
    p.add_argument("--torch_seg_ckpt", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--static_guide", default=None,
                   help="path to the per-dataset guide image; its encoder "
                        "taps are precomputed and baked into the artifact")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu' (default: current)")
    p.add_argument("--fuse_only", action="store_true",
                   help="export fusion only (no segmentation head)")
    p.add_argument("--vis_channel", default="r", choices=["r", "y"])
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from .. import serving
    from .test_fusion import build_model_and_variables

    model, variables = build_model_and_variables(
        args.backbone, args.num_classes, args.checkpoint_dir,
        args.torch_fusion_ckpt, args.torch_seg_ckpt)

    guide = None
    if args.static_guide:
        from pathlib import Path

        from ..data.datasets import _load_image
        g = np.asarray(_load_image(Path(args.static_guide), gray_to_rgb=True),
                       np.float32)
        if g.max() > 1.5:
            g = g / 255.0
        guide = jnp.asarray(g)[None]

    platforms = args.platforms.split(",") if args.platforms else None
    data = serving.export_serving_artifact(
        model, variables, args.batch, args.height, args.width,
        guide_rgb=guide, with_seg=not args.fuse_only,
        vis_channel=args.vis_channel, platforms=platforms)
    serving.save_serving_artifact(args.out, data)
    specs = serving.serving_input_specs(args.out)
    print(f"wrote {args.out}: {len(data)/1e6:.1f} MB, inputs {specs}, "
          f"platforms {platforms or ['current']}")


if __name__ == "__main__":
    main()
