"""E25 (round 4): WHERE the in-context int8 DRDB loss comes from.

e24 standalone: the int8 XLA chain beats bf16 by 4 ms per DRDB (14.85 vs
18.86). e22 clean rerun: in-context the int8 core LOSES ~5 ms (169.9 vs
165.1). With 4 DRDB applications per fuse that is ~20 ms of overhead
appearing only in context. This profiles both cores (hlo_stats) and
prints the per-category delta plus each side's top ops, so the verdict
("adopt int8 serving" vs "measured rejection") rests on an identified
mechanism, not speculation.

Run on v5e:  python experiments/e25_int8_core_profile.py
"""
import collections
import time

import _cache

import jax
import jax.numpy as jnp

_cache.enable()

from e8_profile_r3 import TRACE_DIR, hlo_stats  # noqa: E402

from segmif_tpu.models.network import JointPipeline  # noqa: E402
from segmif_tpu.serving import quantize_for_serving  # noqa: E402


def profile_core(fuse, args, label):
    out = fuse(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = fuse(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 4 * 1000
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = fuse(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    obj = hlo_stats(TRACE_DIR)
    cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    per_cat = collections.Counter()
    parsed = []
    for r in obj["rows"]:
        c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
        cat = c[idx["HLO op category"]] or "?"
        t_us = float(c[idx["Total self time (us)"]] or 0.0)
        name = str(c[idx["Framework op name"]] or c[idx["HLO op name"]] or "")
        per_cat[cat] += t_us / 3
        parsed.append((t_us / 3, cat, name, c[idx["Bound by"]],
                       float(c[idx["Normalized GFLOP/s"]] or 0)))
    parsed.sort(reverse=True)
    total = sum(per_cat.values())
    print(f"\n== {label}: timed {ms:.1f} ms, self-time "
          f"{total / 1000:.1f} ms ==", flush=True)
    for cat, us in per_cat.most_common(14):
        print(f"  {cat:32s} {us / 1000:7.2f} ms ({us / total * 100:4.1f}%)")
    print(f"-- top 25 ops --")
    import re
    for t_us, cat, name, bound, gfs in parsed[:25]:
        short = re.sub(r"jit\([a-z_0-9]+\)/", "", name)
        print(f"  {t_us / 1000:7.3f} [{str(cat)[:16]:16s}] "
              f"bound={str(bound):8s} {gfs:8.0f}GF/s {short[:110]}")
    return per_cat


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    model_q, vars_q = quantize_for_serving(model, variables, (ir, vis))
    taps = jax.jit(lambda v, g: model.apply(
        v, g, method=JointPipeline.guide_taps_raw))(variables, vis)

    cats = {}
    for label, m, v in (("bf16 core", model, variables),
                        ("int8 core", model_q, vars_q)):
        @jax.jit
        def fuse(ir_, vis_, t1, t2, m=m, v=v):
            fr, fy = m.apply(v, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
            return fr + fy.mean()

        cats[label] = profile_core(fuse, (ir, vis) + tuple(taps), label)

    print("\n== per-category delta (int8 - bf16, ms; + means int8 pays "
          "more) ==")
    allcats = set(cats["bf16 core"]) | set(cats["int8 core"])
    rows = sorted(allcats, key=lambda c: -(abs(cats["int8 core"].get(c, 0)
                                               - cats["bf16 core"].get(c, 0))))
    for cat in rows[:16]:
        a = cats["bf16 core"].get(cat, 0) / 1000
        q = cats["int8 core"].get(cat, 0) / 1000
        print(f"  {cat:32s} bf16 {a:7.2f}  int8 {q:7.2f}  delta {q - a:+6.2f}")


if __name__ == "__main__":
    main()
