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

    iters = 20 if on_tpu else 2

    # The whole measurement runs IN-GRAPH (lax.scan with a data dependency
    # between iterations): remote-execution tunnels make per-call
    # block_until_ready unreliable, and per-call dispatch would pollute the
    # steady-state number anyway.
    @jax.jit
    def pipeline_many(variables, ir, vis):
        def body(carry, _):
            carry_ir, carry_vis = carry
            # EVERY input must depend on the carry, or XLA hoists the
            # loop-invariant parts (e.g. the guide-encoder pass) out of the
            # loop and the number lies
            fused_rgb, fused_y, logits = model.apply(variables, carry_ir,
                                                     carry_vis)
            pred = jnp.argmax(logits, axis=-1)
            eps = jnp.mean(fused_y) * 1e-7
            return (carry_ir + eps, carry_vis + eps), (jnp.sum(pred),
                                                       jnp.mean(fused_rgb))
        carry, outs = jax.lax.scan(body, (ir, vis), None, length=iters)
        return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]

    float(pipeline_many(variables, ir, vis))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(pipeline_many(variables, ir, vis))  # host fetch = real barrier
        times.append(time.perf_counter() - t0)
    dt = min(times)

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
