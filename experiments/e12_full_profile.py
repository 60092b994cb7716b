"""E12 (round 3): hlo_stats profile of the FULL default bench step.

bench.py's default mode runs guide_taps (mit_b3 encoder on vis) + fusion
core + segmentation of the fused image, per iteration. e8 profiled only
the served-taps fusion core; this profiles the whole thing so round-3
perf work targets the biggest levers of the OFFICIAL number.

Prints the timed step, per-category totals, a fusion/seg/taps split by
framework-op prefix, and the top-60 ops.
"""
import collections
import re
import time

import jax
import jax.numpy as jnp
from jax import lax

import _cache

_cache.enable()

from e8_profile_r3 import TRACE_DIR, hlo_stats  # noqa: E402
from segmif_tpu.models.network import JointPipeline  # noqa: E402


def timed(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*a):
        def body(carry, _):
            ir, vis = a[0] + carry, a[1]
            fr, fy, logits = fn(ir, vis)
            s = (jnp.mean(fr.astype(jnp.float32))
                 + jnp.sum(jnp.argmax(logits, -1)) * 0.0) * 1e-7
            return carry + s.astype(carry.dtype), ()
        carry, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return carry
    float(many(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000, many


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])

    def full(ir_, vis_):
        return model.apply(variables, ir_, vis_)

    t, many = timed(full, (ir, vis))
    print(f"full default step: {t:.1f} ms  ({b / t * 1000:.1f} pairs/s)",
          flush=True)

    float(many(ir, vis))
    jax.profiler.start_trace(TRACE_DIR)
    float(many(ir, vis))
    jax.profiler.stop_trace()

    obj = hlo_stats(TRACE_DIR)
    cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    per_cat = collections.Counter()
    per_part = collections.Counter()
    parsed = []
    DISP = 8  # scan length inside one dispatch
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
    print(f"\n== parts (total {total/DISP/1000:.1f} ms/step profiled"
          f" self-time) ==")
    for p, us in per_part.most_common():
        print(f"  {p:14s} {us/DISP/1000:7.2f} ms/step ({us/total*100:4.1f}%)")
    print("\n== categories ==")
    for cat, us in per_cat.most_common():
        print(f"  {cat:30s} {us/DISP/1000:7.2f} ms/step "
              f"({us/total*100:4.1f}%)")
    print("\n== top 60 ops (ms/step) ==")
    for t_us, cat, name, bound, gfs, bw, part in parsed[:60]:
        short = re.sub(r"jit\(many\)/.*?JointPipeline", "JP", name)
        print(f"  {t_us/DISP/1000:7.3f} [{str(cat)[:14]:14s}|{part[:6]:6s}] "
              f"bound={str(bound):8s} {gfs:8.0f}GF/s {bw:5.0f}GiB/s "
              f"{short[:92]}")


if __name__ == "__main__":
    main()
