"""E28 (round 5): fresh default-step map + batch sweep.

VERDICT r4 next-step #1 prep: before attacking the ~74 ms of non-conv time
in the core, re-profile the CURRENT default bench step (the official
number's exact workload) and re-sweep batch size — the b8 sweet spot was
established in round 1, two trunk redesigns ago; the strip formulation's
per-plane conv regime is batch-independent, so larger batches now amortize
fixed overheads without leaving the fast regime.

Parts:
  1  timed default step at b8 + hlo_stats: categories, per-part split,
     top-40 ops (today's map of the 74 ms).
  2  batch sweep b in {8, 12, 16}, default AND serving modes (fresh jit
     per combo, in-graph scan, carry-dependent inputs).

Run on a QUIET host (no CPU suite):  python experiments/e28_round5_profile.py
"""
import argparse
import collections
import re
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()

from e8_profile_r3 import TRACE_DIR, hlo_stats  # noqa: E402
from segmif_tpu.models.network import JointPipeline  # noqa: E402


def build_many(model, variables, taps, iters):
    """bench.py-equivalent in-graph scan (carry-dependent inputs)."""
    if taps is None:
        @jax.jit
        def many(ir, vis):
            def body(carry, _):
                cir, cvis = carry
                fr, fy, logits = model.apply(variables, cir, cvis)
                pred = jnp.argmax(logits, axis=-1)
                eps = jnp.mean(fy) * 1e-7
                return (cir + eps, cvis + eps), (jnp.sum(pred),
                                                 jnp.mean(fr))
            carry, outs = lax.scan(body, (ir, vis), None, length=iters)
            return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]
    else:
        @jax.jit
        def many(ir, vis):
            def body(carry, _):
                cir, cvis = carry
                fr, fy, logits = model.apply(variables, cir, cvis,
                                             taps=taps)
                pred = jnp.argmax(logits, axis=-1)
                eps = jnp.mean(fy) * 1e-7
                return (cir + eps, cvis + eps), (jnp.sum(pred),
                                                 jnp.mean(fr))
            carry, outs = lax.scan(body, (ir, vis), None, length=iters)
            return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]
    return many


def timed(many, ir, vis, iters, reps=3):
    float(many(ir, vis))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(ir, vis))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


def make_inputs(rng, b, h, w):
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    return ir, vis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_profile", action="store_true")
    ap.add_argument("--skip_sweep", action="store_true")
    args = ap.parse_args()

    h, w, iters = 480, 640, 8
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir8, vis8 = make_inputs(rng, 8, h, w)
    variables = model.init(rng, ir8[:1], vis8[:1])

    # ---- part 1: profile the default step at b8 ----
    if not args.skip_profile:
        many = build_many(model, variables, None, iters)
        t = timed(many, ir8, vis8, iters)
        print(f"default step b8: {t:.1f} ms ({8 / t * 1000:.1f} pairs/s)",
              flush=True)

        jax.profiler.start_trace(TRACE_DIR)
        float(many(ir8, vis8))
        jax.profiler.stop_trace()
        obj = hlo_stats(TRACE_DIR)
        cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]
        idx = {c: i for i, c in enumerate(cols)}
        per_cat = collections.Counter()
        per_part = collections.Counter()
        parsed = []
        for r in obj["rows"]:
            c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
            cat = c[idx["HLO op category"]] or "?"
            t_us = float(c[idx["Total self time (us)"]] or 0.0)
            name = str(c[idx["Framework op name"]]
                       or c[idx["HLO op name"]] or "")
            bound = c[idx["Bound by"]]
            gfs = float(c[idx["Normalized GFLOP/s"]] or 0.0)
            bw = float(c[idx["Measured memory BW (GiB/s)"]] or 0.0)
            per_cat[cat] += t_us
            if "/fusion/" in name or "fuse/recombine" in name:
                part = "fusion-net"
            elif "guide_taps" in name or ".taps" in name:
                part = "guide-taps"
            elif "/seg/" in name or "segment" in name:
                part = "seg"
            else:
                part = "other/glue"
            per_part[part] += t_us
            parsed.append((t_us, cat, name, bound, gfs, bw, part))
        parsed.sort(reverse=True)
        total = sum(per_cat.values())
        print(f"\n== parts (total {total/iters/1000:.1f} ms/step profiled)"
              " ==")
        for p, us in per_part.most_common():
            print(f"  {p:14s} {us/iters/1000:7.2f} ms/step "
                  f"({us/total*100:4.1f}%)")
        print("\n== categories ==")
        for cat, us in per_cat.most_common():
            print(f"  {cat:30s} {us/iters/1000:7.2f} ms/step "
                  f"({us/total*100:4.1f}%)")
        print("\n== top 40 ops (ms/step) ==")
        for t_us, cat, name, bound, gfs, bw, part in parsed[:40]:
            short = re.sub(r"jit\(many\)/.*?JointPipeline", "JP", name)
            print(f"  {t_us/iters/1000:7.3f} [{str(cat)[:14]:14s}|"
                  f"{part[:6]:6s}] bound={str(bound):8s} {gfs:8.0f}GF/s "
                  f"{bw:5.0f}GiB/s {short[:90]}", flush=True)

    # ---- part 2: batch sweep ----
    if not args.skip_sweep:
        print("\n== batch sweep (fresh jit per combo) ==", flush=True)
        for b in (8, 12, 16):
            irb, visb = make_inputs(rng, b, h, w)
            for serving in (False, True):
                taps = None
                if serving:
                    taps = jax.jit(lambda v, g: model.apply(
                        v, g, method=JointPipeline.guide_taps_raw))(
                            variables, visb)
                many = build_many(model, variables, taps, iters)
                try:
                    t = timed(many, irb, visb, iters)
                    tag = "serving" if serving else "default"
                    print(f"  b{b:2d} {tag:8s}: {t:7.1f} ms/step "
                          f"({b / t * 1000:6.2f} pairs/s)", flush=True)
                except Exception as e:
                    print(f"  b{b:2d} {'serving' if serving else 'default'}:"
                          f" FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
