"""E29 (round 5): put a NUMBER on the 1080p stretch config.

VERDICT r4 missing #3: `configs/stretch_1080p.yaml` + the spatial path
exist with correctness tests, but no artifact records a single-chip
mit_b5@1080p throughput or an HBM-fit statement. This measures, on the one
real v5e chip (16 GB HBM), serving-mode (precomputed guide taps — the
deployment semantics) and default-mode joint fusion+segmentation at
1080x1920, batch 1 and 2, with the bench.py in-graph-scan methodology
(carry-dependent inputs; host fetch as the barrier). OOMs are caught and
recorded as the fit statement.

Run on v5e:  python experiments/e29_stretch_1080p.py [--backbone mit_b5]
"""
import argparse
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402


def build_many(model, variables, taps, iters):
    @jax.jit
    def many(ir, vis):
        def body(carry, _):
            cir, cvis = carry
            kw = {} if taps is None else {"taps": taps}
            fr, fy, logits = model.apply(variables, cir, cvis, **kw)
            pred = jnp.argmax(logits, axis=-1)
            eps = jnp.mean(fy) * 1e-7
            return (cir + eps, cvis + eps), (jnp.sum(pred), jnp.mean(fr))
        carry, outs = lax.scan(body, (ir, vis), None, length=iters)
        return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]
    return many


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="mit_b5")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    h, w = 1080, 1920
    iters = args.iters

    model = JointPipeline(args.backbone, num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 1)),
                           jnp.zeros((1, 64, 64, 3)))
    print(f"{args.backbone} @ {h}x{w}, one v5e chip (16G HBM)", flush=True)

    for b in (1, 2):
        ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
        vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
        for serving in (True, False):
            tag = "serving" if serving else "default"
            try:
                taps = None
                if serving:
                    taps = jax.jit(lambda v, g: model.apply(
                        v, g, method=JointPipeline.guide_taps_raw))(
                            variables, vis)
                many = build_many(model, variables, taps, iters)
                float(many(ir, vis))  # compile + warmup
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(many(ir, vis))
                    ts.append(time.perf_counter() - t0)
                t = min(ts) / iters * 1000
                print(f"  b{b} {tag:8s}: {t:8.1f} ms/step "
                      f"({b / t * 1000:5.2f} pairs/s = fps)", flush=True)
            except Exception as e:
                msg = str(e).replace("\n", " ")[:200]
                print(f"  b{b} {tag:8s}: FAILED {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
