"""Per-round accuracy regression artifact (VERDICT r3 missing #3).

The reference's accuracy record is its running txt appends
(/root/reference/val_performance.py:209,297) and mIoU-gated checkpoints
(/root/reference/train.py:234-239). This repo's per-round equivalent: run
the pinned synthetic-overfit config (the same one tests/test_learning.py
asserts on) through the REAL InteractiveTrainer and emit one JSON line of
accuracy numbers, so every round of perf surgery leaves a committed
"still learns, still parity" trace next to BENCH_r*.json.

  python accuracy.py [--out ACCURACY_r04.json] [--skip_overfit]
                     [--skip_drift] [--drift_int8]

Sections (each skippable):
 - overfit: round-1 fusion-loss head/min/tail, best train mIoU vs the
   class-prior baseline, round-2 regenerated-image SSIM vs the guide
   (CPU- or TPU-runnable; ~15-30 min on the 1-core CPU host).
 - drift (TPU only): bf16-vs-f32 fused-Y SSIM / max-abs-diff / seg argmax
   agreement on converted reference weights (the tests/test_bf16_drift.py
   harness, mit_b1 480x640) — the numbers that gate the bf16 default.
   --drift_int8 adds the same comparison for the int8 serving path.
   NOTE "converted reference weights" = the reference ARCHITECTURE's
   torch-initialized (seed-0 random) weights round-tripped through the
   checkpoint converters — the reference repo ships no trained
   checkpoints (downloads only), so architecture-level parity is the
   strongest claim any harness here can make; it is NOT drift on a
   trained model.

The LAST stdout line is the JSON artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def run_overfit() -> dict:
    """The pinned synthetic-overfit config of tests/test_learning.py."""
    import numpy as np

    from segmif_tpu.config import (DataConfig, FusionPhaseConfig,
                                   SegPhaseConfig, TrainConfig)
    from segmif_tpu.data.datasets import SyntheticFusionDataset
    from segmif_tpu.train.interactive import InteractiveTrainer

    with tempfile.TemporaryDirectory() as ckpt:
        cfg = TrainConfig(
            backbone="mit_b0", rounds=2, log_iters=10, checkpoint_dir=ckpt,
            compute_dtype="float32",
            data=DataConfig(num_classes=9, crop_size=64,
                            rescale_range=(1.0, 1.0)),
            fusion=FusionPhaseConfig(iters_round1=600, iters_later=60,
                                     batch_size=4, crop_size=64,
                                     checkpoint_every=10_000,
                                     learning_rate=4e-4,
                                     dwa_warmup_steps=5),
            seg=SegPhaseConfig(iters=200, batch_size=4, eval_every=200),
            mesh_data=1,
        )
        train_ds = SyntheticFusionDataset(n=4, size=(64, 64))
        val_ds = SyntheticFusionDataset(n=4, size=(64, 64))
        t = InteractiveTrainer(cfg, train_ds, val_ds)
        result = t.run()

    r1 = [loss for rnd, _, loss in t.fusion_loss_history if rnd == 1]
    labels = np.stack([train_ds[i][4] for i in range(len(train_ds))])
    counts = np.bincount(labels.ravel(), minlength=9)
    prior = float(counts.max() / labels.size / 9)  # class-prior mIoU
    ssim_hist = dict(t.ssim_history)
    per_round = {h["round"]: h["mIoU"] for h in t.history}
    return {
        "fusion_r1_head": round(float(np.mean(r1[:2])), 4),
        "fusion_r1_min": round(float(np.min(r1)), 4),
        "fusion_r1_tail": round(float(np.mean(r1[-2:])), 4),
        "fusion_r1_min_ratio": round(float(np.mean(r1[:2]) / np.min(r1)), 2),
        "best_mIoU": round(float(result["best_mIoU"]), 4),
        "class_prior_mIoU": round(prior, 4),
        "mIoU_round1": round(float(per_round.get(1, 0.0)), 4),
        "mIoU_round2": round(float(per_round.get(2, 0.0)), 4),
        "ssim_vs_guide_round2": round(float(ssim_hist.get(2, 0.0)), 4),
    }


def _run_pipeline(pair, ir, vis):
    """One (model, variables) pipeline -> (fused_y f32 np, argmax np)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    model, variables = pair
    fused_rgb, fused_y, logits = jax.jit(
        lambda v, a, c, m=model: m.apply(v, a, c))(variables, ir, vis)
    return (np.asarray(fused_y, dtype=np.float32),
            np.asarray(jnp.argmax(logits, -1)))


def _drift_pair(out_a, out_b):
    """fused-Y SSIM / maxdiff / argmax agreement between two pipeline
    outputs from _run_pipeline (each model is run/compiled ONCE even when
    it appears in several comparison pairs)."""
    import jax.numpy as jnp
    import numpy as np

    from segmif_tpu.ops.ssim import ssim

    (ya, pa), (yb, pb) = out_a, out_b
    return {
        "fused_y_ssim": round(float(ssim(jnp.asarray(yb), jnp.asarray(ya))),
                              5),
        "fused_y_maxdiff": round(float(np.max(np.abs(yb - ya))), 5),
        "argmax_agree": round(float(np.mean(pb == pa)), 5),
    }


def run_drift(with_int8: bool) -> dict:
    """bf16 (and optionally int8) vs f32 on converted reference weights —
    TPU only (the CPU backend can't execute bf16 dots)."""
    import jax

    if jax.default_backend() == "cpu":
        return {"skipped": "drift needs TPU (bf16 dots)"}
    import numpy as np
    import torch

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from reference_loader import load_reference_core

    from segmif_tpu.models.network import JointPipeline
    from segmif_tpu.train.checkpoint import (load_torch_fusion_network,
                                             load_torch_seg_network)

    torch.manual_seed(0)
    _, mf, _ = load_reference_core()
    ref_fusion = mf.Fusion_Network3_ac().eval()
    ref_seg = mf.Network3("mit_b1", 9, 256, pretrained=None).eval()
    with tempfile.TemporaryDirectory() as d:
        fpath, spath = os.path.join(d, "f.pth"), os.path.join(d, "s.pth")
        torch.save(ref_fusion.state_dict(), fpath)
        torch.save(ref_seg.state_dict(), spath)
        fusion_params = load_torch_fusion_network(fpath)
        seg_params, batch_stats = load_torch_seg_network(spath)

    rng = np.random.default_rng(3)
    b, h, w = 2, 480, 640
    ir = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    variables = {"params": {"fusion": fusion_params, "seg": seg_params},
                 "batch_stats": {"seg": batch_stats}}

    f32 = JointPipeline("mit_b1", num_classes=9, dtype=jnp.float32)
    bf16 = JointPipeline("mit_b1", num_classes=9, dtype=jnp.bfloat16)
    out_f32 = _run_pipeline((f32, variables), ir, vis)
    out_bf16 = _run_pipeline((bf16, variables), ir, vis)
    out = {"bf16_vs_f32": _drift_pair(out_f32, out_bf16)}
    if with_int8:
        from segmif_tpu.serving import quantize_for_serving

        model_q, vars_q = quantize_for_serving(bf16, variables, (ir, vis))
        out_q = _run_pipeline((model_q, vars_q), ir, vis)
        out["int8_vs_f32"] = _drift_pair(out_f32, out_q)
        out["int8_vs_bf16"] = _drift_pair(out_bf16, out_q)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="")
    p.add_argument("--skip_overfit", action="store_true")
    p.add_argument("--skip_drift", action="store_true")
    p.add_argument("--drift_int8", action="store_true",
                   help="add int8-serving-path drift vs f32 (TPU)")
    args = p.parse_args()

    _enable_compile_cache()
    import jax

    from segmif_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    result = {"platform": jax.devices()[0].platform}
    if not args.skip_overfit:
        result["overfit"] = run_overfit()
        print(json.dumps({"overfit": result["overfit"]}), flush=True)
    if not args.skip_drift:
        result["drift"] = run_drift(args.drift_int8)
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
