"""CLI: convert reference torch .pth checkpoints to Orbax.

    python -m segmif_tpu.cli.convert_checkpoint \
        --torch_fusion_ckpt modelfusion-final2.pth \
        --torch_seg_ckpt model-fusion_add_final2.pth \
        --out_dir ./checkpoint --backbone mit_b3 --num_classes 9

Also converts the official ImageNet mit_bN encoder checkpoints
(--torch_encoder_ckpt pretrained/mit_b3.pth) into a seg checkpoint with a
freshly initialized decode head, matching WeTr's pretrained init
(/root/reference/core/model_fusion.py:22-26).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_fusion_ckpt", default=None)
    p.add_argument("--torch_seg_ckpt", default=None)
    p.add_argument("--torch_encoder_ckpt", default=None)
    p.add_argument("--out_dir", default="./checkpoint")
    p.add_argument("--backbone", default="mit_b3")
    p.add_argument("--num_classes", type=int, default=9)
    args = p.parse_args(argv)

    from ..utils.platform import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp

    from ..models.network import JointPipeline
    from ..train import checkpoint as ckpt

    model = JointPipeline(args.backbone, args.num_classes)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    out = Path(args.out_dir)

    if args.torch_seg_ckpt:
        seg_params, seg_stats = ckpt.load_torch_seg_network(args.torch_seg_ckpt)
        params["seg"] = jax.tree.map(jnp.asarray, seg_params)
        batch_stats = {"seg": jax.tree.map(jnp.asarray, seg_stats)}
        print(f"converted seg checkpoint {args.torch_seg_ckpt}")
    elif args.torch_encoder_ckpt:
        enc = ckpt.load_torch_mit_pretrained(args.torch_encoder_ckpt)
        params["seg"]["seg"]["encoder"] = jax.tree.map(jnp.asarray, enc)
        print(f"converted pretrained encoder {args.torch_encoder_ckpt} "
              "(decode head freshly initialized)")
    if args.torch_seg_ckpt or args.torch_encoder_ckpt:
        ckpt.save_checkpoint(out / "seg_params",
                             {"seg": params["seg"],
                              "batch_stats": batch_stats})
        print(f"wrote {out / 'seg_params'}")

    if args.torch_fusion_ckpt:
        fusion = ckpt.load_torch_fusion_network(args.torch_fusion_ckpt)
        params["fusion"] = jax.tree.map(jnp.asarray, fusion)
        ckpt.save_checkpoint(out / "fusion_params",
                             {"fusion": params["fusion"]})
        print(f"converted fusion checkpoint {args.torch_fusion_ckpt} -> "
              f"{out / 'fusion_params'}")


if __name__ == "__main__":
    main()
