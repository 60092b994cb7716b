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
    p.add_argument("--int8", action="store_true",
                   help="quantize the fusion DRDBs to calibrated int8 "
                        "(kernels/int8.py); calibration uses --calib_ir/"
                        "--calib_vis images, or the static guide / random "
                        "data as fallback")
    p.add_argument("--calib_ir", default=None,
                   help="IR image for int8 calibration")
    p.add_argument("--calib_vis", default=None,
                   help="VIS image for int8 calibration")
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
    int8_calibration = None
    if args.int8:
        from pathlib import Path

        from ..data.datasets import _load_image

        def load01(path, gray):
            a = np.asarray(_load_image(Path(path), gray_to_rgb=not gray),
                           np.float32)
            if a.max() > 1.5:
                a = a / 255.0
            if gray:
                a = a[..., :1]
            return jnp.asarray(a)[None]

        if args.calib_ir and args.calib_vis:
            ir_cal = load01(args.calib_ir, gray=True)
            vis_cal = load01(args.calib_vis, gray=False)
        else:
            # fallback: calibrate on the guide (or uniform noise) — amaxes
            # only need representative DYNAMIC RANGE, inputs are [0,1]
            rng = np.random.default_rng(0)
            vis_cal = (guide if guide is not None else jnp.asarray(
                rng.uniform(0, 1, (1, args.height, args.width, 3))
                .astype(np.float32)))
            ir_cal = jnp.asarray(rng.uniform(
                0, 1, (1, args.height, args.width, 1)).astype(np.float32))
        int8_calibration = (ir_cal, vis_cal)
    data = serving.export_serving_artifact(
        model, variables, args.batch, args.height, args.width,
        guide_rgb=guide, with_seg=not args.fuse_only,
        vis_channel=args.vis_channel, platforms=platforms,
        int8_calibration=int8_calibration)
    serving.save_serving_artifact(args.out, data)
    specs = serving.serving_input_specs(args.out)
    print(f"wrote {args.out}: {len(data)/1e6:.1f} MB, inputs {specs}, "
          f"platforms {platforms or ['current']}")


if __name__ == "__main__":
    main()
