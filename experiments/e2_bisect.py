"""E2: in-context bisection of the joint pipeline at flagship config.

Times (via carry-dependent lax.scan, min of 3 reps) each stage of the
480x640 mit_b3 bf16 batch-8 joint pipeline by building scan bodies that stop
at successive depths. Differences between successive depths give in-context
stage costs (the only honest way — standalone probes understate XLA fusion,
OPTIMIZATION.md addendum 6).
"""
import time

import jax
import jax.numpy as jnp

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402


def timed_scan(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*args):
        def body(carry, _):
            out = fn(*[a + carry for a in args[:1]], *args[1:])
            s = jnp.mean(out.astype(jnp.float32)) * 1e-7
            return carry + s.astype(carry.dtype), ()
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry
    float(many(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])

    def full(ir_, vis_):
        fr, fy, lg = model.apply(variables, ir_, vis_)
        return fr + lg.mean() + fy.mean()

    def fuse_only(ir_, vis_):
        fr, fy = model.apply(variables, ir_, vis_,
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    def taps_only(vis_):
        t1, t2 = model.apply(variables, vis_,
                             method=JointPipeline.guide_taps)
        return t1 + t2.mean()

    def seg_only(vis_):
        lg = model.apply(variables, vis_,
                         method=lambda m, x, det=True: m.seg(x, det))
        return lg

    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps))(variables)

    # taps must be ARGUMENTS, not closure captures: closed-over arrays embed
    # as literal constants in the jaxpr and the ~300 MB payload blows up the
    # tunnel's remote compile (HTTP 413 / multi-10-min compiles)
    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    # measure + print one at a time so partial results survive a timeout
    t_fsv = timed_scan(fuse_served, (ir, vis) + tuple(taps))
    print(f"fuse (served taps)  : {t_fsv:7.1f} ms  => fusion-net core",
          flush=True)
    t_seg = timed_scan(seg_only, (vis,))
    print(f"seg net alone       : {t_seg:7.1f} ms", flush=True)
    print(f"serving joint est.  : {t_fsv + t_seg:7.1f} ms  "
          f"({b / (t_fsv + t_seg) * 1000:.1f} pairs/s)", flush=True)
    t_taps = timed_scan(taps_only, (vis,))
    print(f"guide taps alone    : {t_taps:7.1f} ms", flush=True)
    t_full = timed_scan(full, (ir, vis))
    print(f"full joint          : {t_full:7.1f} ms  "
          f"({b / t_full * 1000:.1f} pairs/s)", flush=True)
    t_fuse = timed_scan(fuse_only, (ir, vis))
    print(f"fuse (taps in-loop) : {t_fuse:7.1f} ms", flush=True)
    print(f"implied seg-on-fused: {t_full - t_fuse:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
