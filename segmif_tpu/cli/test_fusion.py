"""CLI: fusion inference over a test directory, writing fused RGB images.

Reference-compatible role (/root/reference/test_fusion.py): load the fusion
+ seg checkpoints, fuse every (IR, VIS) pair using seg-encoder features of
the guide image, and write fused PNGs to --out_dir.

    python -m segmif_tpu.cli.test_fusion --data_root ./test_all \
        --checkpoint_dir ./checkpoint --out_dir ./Fused_images

Accepts either Orbax checkpoints (fusion_params/, seg_params/) or reference
torch checkpoints (--torch_fusion_ckpt / --torch_seg_ckpt .pth files).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def build_model_and_variables(backbone: str, num_classes: int,
                              checkpoint_dir: str | None,
                              torch_fusion_ckpt: str | None = None,
                              torch_seg_ckpt: str | None = None,
                              crop: int = 64):
    import jax
    import jax.numpy as jnp

    from ..models.network import JointPipeline
    from ..train import checkpoint as ckpt

    model = JointPipeline(backbone, num_classes)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 1)),
                           jnp.zeros((1, crop, crop, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if torch_seg_ckpt:
        seg_params, seg_stats = ckpt.load_torch_seg_network(torch_seg_ckpt)
        params["seg"] = jax.tree.map(jnp.asarray, seg_params)
        batch_stats = {"seg": jax.tree.map(jnp.asarray, seg_stats)}
    if torch_fusion_ckpt:
        params["fusion"] = jax.tree.map(
            jnp.asarray, ckpt.load_torch_fusion_network(torch_fusion_ckpt))
    if checkpoint_dir:
        base = Path(checkpoint_dir)
        if (base / "fusion_params").exists():
            tree = ckpt.restore_checkpoint(base / "fusion_params",
                                           {"fusion": params["fusion"]})
            params["fusion"] = tree["fusion"]
        if (base / "seg_params").exists():
            tree = ckpt.restore_checkpoint(
                base / "seg_params",
                {"seg": params["seg"], "batch_stats": batch_stats})
            params["seg"] = tree["seg"]
            batch_stats = tree["batch_stats"]
    return model, {"params": params, "batch_stats": batch_stats}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--ir_dir", default="Infrared")
    p.add_argument("--vis_dir", default="Visible")
    p.add_argument("--guide_dir", default="Mask2")
    p.add_argument("--label_dir", default="Label")
    p.add_argument("--out_dir", default="Fused_images")
    p.add_argument("--checkpoint_dir", default="./checkpoint")
    p.add_argument("--torch_fusion_ckpt", default=None)
    p.add_argument("--torch_seg_ckpt", default=None)
    p.add_argument("--backbone", default="mit_b3")
    p.add_argument("--num_classes", type=int, default=9)
    p.add_argument("-B", "--batch_size", type=int, default=4)
    p.add_argument("--reference_quantization", action="store_true",
                   help="reproduce the reference's double uint8 quantization")
    p.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="shard the fusion trunk's image rows over N devices "
                        "(the 1080p/mit_b5 stretch path, exact — "
                        "parallel/spatial.py); 0 = single-device")
    p.add_argument("--static_guide", default=None, metavar="IMAGE",
                   help="serving mode: compute the guide's seg-encoder taps "
                        "ONCE from this image and reuse them for every pair "
                        "(removes one encoder pass per pair; the reference "
                        "recomputes the guide features per image, "
                        "test_fusion.py:100)")
    args = p.parse_args(argv)

    from ..utils.platform import honor_platform_env

    honor_platform_env()

    import jax

    from ..data.datasets import FusionFolderDataset
    from ..eval.evaluator import generate_fused
    from ..train.steps import make_fuse_fn

    model, variables = build_model_and_variables(
        args.backbone, args.num_classes, args.checkpoint_dir,
        args.torch_fusion_ckpt, args.torch_seg_ckpt)
    ds = FusionFolderDataset(args.data_root, ir_dir=args.ir_dir,
                             vis_dir=args.vis_dir, guide_dir=args.guide_dir,
                             label_dir=args.label_dir)
    if args.spatial:
        from ..parallel.mesh import make_mesh
        from ..parallel.spatial import make_spatial_fuse_fn

        mesh = make_mesh(data=args.spatial, model=1)
        fuse_fn = jax.jit(make_spatial_fuse_fn(mesh, model))
    elif args.static_guide:
        import jax.numpy as jnp

        from ..data.datasets import _load_image
        from ..models.network import JointPipeline

        guide_img = _load_image(Path(args.static_guide), gray_to_rgb=True)
        guide01 = jnp.asarray(guide_img, jnp.float32)[None] / 255.0
        taps = jax.jit(lambda v, g: model.apply(
            v, g, method=JointPipeline.guide_taps_raw))(variables, guide01)

        @jax.jit
        def fuse_fn(variables, ir, vis, guide):
            # per-sample guide ignored; broadcast the precomputed taps
            b = ir.shape[0]
            bt = tuple(jnp.broadcast_to(t, (b,) + t.shape[1:]) for t in taps)
            return model.apply(variables, ir, vis, taps=bt, deterministic=True,
                               method=JointPipeline.fuse)
    else:
        fuse_fn = jax.jit(make_fuse_fn(model))
    names, fused, _ = generate_fused(
        fuse_fn, variables, ds, batch_size=args.batch_size,
        out_dir=args.out_dir,
        quantize_like_reference=args.reference_quantization)
    print(f"fused {len(names)} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
