"""E8: round-3 hlo_stats profile of the CURRENT default serving fusion core.

Differences vs e6: uses the native-resolution raw taps (guide_taps_raw, the
actual serving hot path — e6 profiled the full-res tap layout) and parses
the xplane with xprof's hlo_stats converter, which gives per-op self time,
measured GiB/s, bound-by, and python source attribution (the workflow from
OPTIMIZATION.md round-2 addendum 7).
"""
import collections
import glob
import json
import re
import time

import jax
import jax.numpy as jnp
from jax import lax

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402

TRACE_DIR = "/tmp/segmif_e8_trace"


def timed_scan(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*args):
        def body(carry, _):
            out = fn(*[a + carry for a in args[:1]], *args[1:])
            s = jnp.mean(out.astype(jnp.float32)) * 1e-7
            return carry + s.astype(carry.dtype), ()
        carry, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return carry
    float(many(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


CATS = [
    ("convolution", re.compile(r"^%?(fusion|convolution).*conv|^%?convolution")),
]


def hlo_stats(trace_dir: str):
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(paths[-1:], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return json.loads(data)


def main(serving=True):
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps_raw))(variables)

    @jax.jit
    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    t = timed_scan(fuse_served, (ir, vis) + tuple(taps))
    print(f"fusion core (served RAW taps): {t:.1f} ms", flush=True)

    out = fuse_served(ir, vis, *taps)
    float(jnp.sum(out))
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = fuse_served(ir, vis, *taps)
    float(jnp.sum(out))
    jax.profiler.stop_trace()

    obj = hlo_stats(TRACE_DIR)
    # gviz table: {cols: [{label}], rows: [{c: [{v}]}]}
    cols = [c["label"] if isinstance(c, dict) else c for c in obj["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    per_cat = collections.Counter()
    parsed = []
    for r in obj["rows"]:
        c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
        cat = c[idx["HLO op category"]] or "?"
        t_us = float(c[idx["Total self time (us)"]] or 0.0)
        name = c[idx["Framework op name"]] or c[idx["HLO op name"]]
        bound = c[idx["Bound by"]]
        gfs = float(c[idx["Normalized GFLOP/s"]] or 0.0)
        bw = float(c[idx["Measured memory BW (GiB/s)"]] or 0.0)
        per_cat[cat] += t_us
        parsed.append((t_us, cat, name, bound, gfs, bw))
    parsed.sort(reverse=True)
    total = sum(per_cat.values())
    DISP = 3  # traced dispatches
    print(f"\n== categories (total {total/DISP/1000:.1f} ms/step) ==")
    for cat, us in per_cat.most_common():
        print(f"  {cat:30s} {us/DISP/1000:7.2f} ms/step "
              f"({us/total*100:4.1f}%)")
    print("\n== top 40 ops (ms/step) ==")
    for t_us, cat, name, bound, gfs, bw in parsed[:40]:
        print(f"  {t_us/DISP/1000:7.3f} [{str(cat)[:16]:16s}] "
              f"bound={bound:8s} {gfs:8.0f}GF/s {bw:6.0f}GiB/s "
              f"{str(name)[:85]}")


if __name__ == "__main__":
    main()
