"""E6: xplane profile of the served fusion core (post native-res taps).

Captures a jax.profiler trace of the serving-mode fusion forward (static
guide taps as arguments) at the flagship config and aggregates TPU-device
HLO event durations by op family, so round-2+ optimization targets the
graph as it IS, not as addendum-6 measured it before the taps change.

Also re-runs the e4 DRDB paired-conv comparison with the block-diagonal
variants REMOVED (they hang XLA compile >400 s, addendum 6) so the grouped
(feature_group_count=2) lowering finally gets a number.
"""
import collections
import glob
import re
import time

import jax
import jax.numpy as jnp
from jax import lax

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402

TRACE_DIR = "/tmp/segmif_e6_trace"


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


FAMILIES = [
    ("conv/dot", re.compile(r"convolution|dot|conv")),
    ("copy", re.compile(r"copy")),
    ("transpose/reshape", re.compile(r"transpose|reshape|bitcast")),
    ("dynamic-update/slice", re.compile(r"dynamic.update|dynamic.slice|slice")),
    ("pad", re.compile(r"pad")),
    ("reduce", re.compile(r"reduce")),
    ("elementwise", re.compile(r"add|multiply|subtract|maximum|select|"
                               r"compare|exp|tanh|rsqrt|divide|convert")),
]


def classify(name: str) -> str:
    base = name.split(".")[0].lower()
    for fam, pat in FAMILIES:
        if pat.search(base):
            return fam
    return "other:" + base[:24]


def parse_xplane(trace_dir: str):
    """Aggregate TPU-device XLA op durations from the newest xplane.pb."""
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    try:
        from xprof.protobuf import xplane_pb2
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = collections.Counter()
    per_fam = collections.Counter()
    n_planes = []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        n_planes.append(plane.name)
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines only (skip steps / TensorFlow name scopes)
            if "xla op" not in lname and "xla_op" not in lname \
                    and not lname.startswith("xla"):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                per_op[name] += dur
                per_fam[classify(name)] += dur
    return per_op, per_fam, n_planes


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps))(variables)

    @jax.jit
    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    t = timed_scan(fuse_served, (ir, vis) + tuple(taps))
    print(f"fusion core (served taps): {t:.1f} ms", flush=True)

    # trace 3 steady-state dispatches
    out = fuse_served(ir, vis, *taps)
    float(jnp.sum(out))
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = fuse_served(ir, vis, *taps)
    float(jnp.sum(out))
    jax.profiler.stop_trace()

    per_op, per_fam, planes = parse_xplane(TRACE_DIR)
    print(f"planes: {planes}", flush=True)
    total = sum(per_fam.values())
    print(f"\n== op families (3 dispatches, total {total:.1f} ms) ==")
    for fam, ms in per_fam.most_common():
        print(f"  {fam:26s} {ms/3:7.2f} ms/step  ({ms/total*100:4.1f}%)")
    print("\n== top 25 individual ops (ms/step) ==")
    for name, ms in per_op.most_common(25):
        print(f"  {ms/3:7.2f}  {name[:110]}")

    # ---- e4 follow-up: grouped paired DRDB conv (bd variants removed) ----
    dt = jnp.bfloat16

    def conv(x, wk, dil=(1, 1), fgc=1):
        return lax.conv_general_dilated(
            x, wk, (1, 1), "SAME", rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc)

    def timed_simple(fn, shapes, iters=16, reps=3):
        @jax.jit
        def many(key):
            arrs = [jax.random.uniform(jax.random.fold_in(key, i), s,
                                       jnp.float32, -1, 1).astype(dt)
                    for i, s in enumerate(shapes)]

            def body(carry, _):
                o = fn(*[a + carry.astype(a.dtype) for a in arrs])
                return (jnp.max(o).astype(jnp.float32) * 1e-9), ()
            carry, _ = lax.scan(body, jnp.float32(0), None, length=iters)
            return carry
        key = jax.random.PRNGKey(0)
        float(many(key))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(many(key))
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters * 1000

    t_phase = timed_simple(lambda x, wk: conv(x, wk),
                           [(128, 70, 320, 64), (3, 3, 64, 160)])
    # fgc=2: kernel [3,3,cin/g=64, cout=320]; out block j uses input group j
    t_grp = timed_simple(
        lambda x, wk: conv(x, jnp.concatenate([wk, wk], -1), fgc=2),
        [(64, 70, 320, 128), (3, 3, 64, 160)])
    print(f"\ndrdb-conv 64->160: phase-strip {t_phase:.2f} ms   "
          f"paired-grouped(fgc=2) {t_grp:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
