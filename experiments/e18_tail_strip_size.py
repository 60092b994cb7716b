"""E18 (round 3): fusion-tail strip-size sweep. pick_strip's 19500-px
fast-regime cap (tuned round-1 on the 64-ch DRDB dil-1 convs) gives the
128/64/32-ch TAIL convs strip 24 at 480x640 — 25% halo-row overcompute.
Sweep SEGMIF_AB=tail_max_plane on the served-taps fusion core."""
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402


def timed_scan(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*args):
        def body(carry, _):
            out = fn(args[0] + carry, *args[1:])
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


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps_raw))(variables)

    def core(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    from segmif_tpu.kernels.strips import pick_strip

    for label, env in (("19500 (default)", None),
                       ("42000", "42000"),
                       ("86000", "86000"),
                       ("no tail strips", "NOSTRIPS")):
        if env == "NOSTRIPS":
            os.environ["SEGMIF_NO_STRIPS"] = "1"
            strip = None
        elif env:
            os.environ["SEGMIF_AB"] = "tail_max_plane=" + env
            strip = pick_strip(h, w, 3)
        else:
            strip = pick_strip(h, w, 3)
        t = timed_scan(core, (ir, vis) + tuple(taps))
        os.environ.pop("SEGMIF_AB", None)
        os.environ.pop("SEGMIF_NO_STRIPS", None)
        print(f"fusion core, tail max_plane {label:16s} (strip {strip}): "
              f"{t:7.1f} ms ({b / t * 1000:5.1f} pairs/s core)", flush=True)


if __name__ == "__main__":
    main()
