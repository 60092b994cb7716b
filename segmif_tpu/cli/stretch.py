"""CLI: the 1080p/mit_b5 stretch path (SURVEY.md §7 step 8, BASELINE.json
configs[4]) — streaming full-resolution fusion with the fusion trunk's image
rows sharded over the device mesh.

    # 8-virtual-device CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m segmif_tpu.cli.stretch --config configs/stretch_1080p.yaml \
        --spatial 8 --synthetic

    # real data (Infrared/Visible/Mask2 layout):
    python -m segmif_tpu.cli.stretch --config configs/stretch_1080p.yaml \
        --spatial 8 --data_root ./test_all --out_dir ./Fused_1080p

The fusion trunk (where full-res activation memory lives — four dense-growth
DRDBs at H x W x 64) runs via parallel/spatial.py: halo-exchanged convs +
psum'd interactive attention, exact vs the single-device forward. The seg
branch stays data-parallel/unsharded (its sr-attention is not
token-separable).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/stretch_1080p.yaml")
    p.add_argument("--spatial", type=int, default=8,
                   help="row shards for the fusion trunk")
    p.add_argument("--synthetic", action="store_true",
                   help="run on one synthetic 1080p pair (no data needed)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--size", type=int, nargs=2, default=None,
                   metavar=("H", "W"), help="override the config resolution")
    p.add_argument("--backbone", default=None,
                   help="override the config backbone (e.g. mit_b0 for smoke)")
    p.add_argument("--no_seg", action="store_true",
                   help="fusion only (skip the segmentation branch)")
    args = p.parse_args(argv)

    from ..utils.platform import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import load_yaml
    from ..models.network import JointPipeline
    from ..parallel.mesh import make_mesh
    from ..parallel.spatial import make_spatial_fuse_fn

    cfg = load_yaml(args.config)
    if args.backbone:
        cfg.backbone = args.backbone
    h, w = args.size if args.size else cfg.data.resize_range
    print(f"stretch config: backbone={cfg.backbone} "
          f"classes={cfg.data.num_classes} resolution={h}x{w} "
          f"spatial shards={args.spatial}")

    mesh = make_mesh(data=args.spatial, model=1)
    # jax>=0.9 CPU backend cannot execute bf16xbf16 dots
    dt = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = JointPipeline(cfg.backbone, cfg.data.num_classes,
                          cfg.embedding_dim, dtype=dt)

    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(0)
    # init at a small size (params are resolution-independent)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 1)),
                           jnp.zeros((1, 64, 64, 3)))
    print(f"params initialized in {time.perf_counter() - t0:.1f}s")

    fuse_fn = jax.jit(make_spatial_fuse_fn(mesh, model))
    seg_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=lambda m, im, det=True: m.seg(im, det)))

    def run_pair(ir, vis, guide):
        t0 = time.perf_counter()
        fused_rgb, fused_y = fuse_fn(variables, ir, vis, guide)
        fused_rgb.block_until_ready()
        t1 = time.perf_counter()
        logits = None
        if not args.no_seg:
            logits = seg_fn(variables, fused_rgb)
            logits.block_until_ready()
        t2 = time.perf_counter()
        return fused_rgb, logits, t1 - t0, t2 - t1

    if args.synthetic or not args.data_root:
        gen = np.random.default_rng(0)
        ir = jnp.asarray(gen.uniform(0, 1, (1, h, w, 1)).astype(np.float32))
        vis = jnp.asarray(gen.uniform(0, 1, (1, h, w, 3)).astype(np.float32))
        for i in range(2):  # rep 0 compiles; rep 1 is the steady-state time
            fused, logits, tf, ts = run_pair(ir, vis, vis)
            tag = "compile+run" if i == 0 else "steady-state"
            print(f"[{tag}] spatial fuse {tf * 1000:.0f} ms"
                  + ("" if args.no_seg else f", seg {ts * 1000:.0f} ms"))
        print(f"fused shape {tuple(fused.shape)}"
              + ("" if logits is None else
                 f", logits shape {tuple(logits.shape)}"))
        print("stretch 1080p OK")
        return

    from ..data.datasets import FusionFolderDataset
    from ..eval.evaluator import generate_fused

    ds = FusionFolderDataset(args.data_root)
    names, fused, _ = generate_fused(fuse_fn, variables, ds, batch_size=1,
                                     out_dir=args.out_dir)
    print(f"fused {len(names)} images at {h}x{w} -> {args.out_dir}")


if __name__ == "__main__":
    main()
