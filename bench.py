"""Benchmark: fused+segmented 480x640 IR-VIS pairs/sec/chip.

The north-star metric (BASELINE.json): run the FULL SegMiF inference
pipeline — seg-encoder feature taps on the guide, fusion network with
hierarchical interactive attention, YCrCb recombination, and the
mit_b3 SegFormer segmentation of the fused image — as ONE jitted XLA graph
in bfloat16, and measure steady-state throughput on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 400 (the >=400 pairs/sec/chip target; the reference
publishes no throughput numbers of its own).
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from segmif_tpu.models.network import JointPipeline

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    h, w = (480, 640) if on_tpu else (96, 128)  # tiny fallback off-TPU
    batch = 8 if on_tpu else 1

    model = JointPipeline("mit_b3" if on_tpu else "mit_b0", num_classes=9,
                          dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (batch, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])

    @jax.jit
    def pipeline(variables, ir, vis):
        fused_rgb, fused_y, logits = model.apply(variables, ir, vis)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return fused_rgb, pred

    # warmup / compile
    out = pipeline(variables, ir, vis)
    jax.block_until_ready(out)

    # steady state
    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(variables, ir, vis)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    result = {
        "metric": f"fused+segmented {h}x{w} IR-VIS pairs/sec/chip "
                  f"(mit_b3 joint pipeline, bf16, batch {batch})",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 400.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
