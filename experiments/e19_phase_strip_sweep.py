"""E19 (round 3): DRDB phase-strip cap sweep (the 22400-px fast-regime cap,
tuned round-1) — same question e18 answered for the tail convs. In-context
on the served-taps fusion core via SEGMIF_AB=phase_max_plane."""
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

    from segmif_tpu.kernels.pallas_drdb import _phase_strip_for

    # caps -> strips at hp=240, wp=320 (s+10)*320: 48->18560, 60->22400
    # (default), 80->28800, 120->41600
    for cap in ("18560", "22400", "28800", "41600"):
        os.environ["SEGMIF_AB"] = "phase_max_plane=" + cap
        strip = _phase_strip_for(240, 320)
        t = timed_scan(core, (ir, vis) + tuple(taps))
        del os.environ["SEGMIF_AB"]
        tag = " (default)" if cap == "22400" else ""
        print(f"fusion core, phase cap {cap}{tag:10s} (strip {strip}): "
              f"{t:7.1f} ms ({b / t * 1000:5.1f} pairs/s core)", flush=True)


if __name__ == "__main__":
    main()
