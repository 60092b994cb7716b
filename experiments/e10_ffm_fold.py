"""E10 (round 3): decompose the FFM no-half-materialization fold changes.

After landing the addendum-3 attack list (sliced gram, zero-padded K=2C
apply, concat halo refresh), e9 measured phase 152.5->134.0 ms but strips
139.6->146.5 ms — the fold helps, the strips-specific changes hurt. This
A/B separated the three changes (fresh jit per combo; all flags are
trace-time). Measured 2026-08-19 on v5e, b8 480x640 bf16, served raw taps:

  strips: sliced gram + concat halos      146.5 ms
  strips: tw gram + concat halos          145.4 ms
  strips: sliced gram + DUS halos         143.1 ms
  strips: tw gram + DUS halos             142.1 ms   (best strips)
  phase trunk (new fold)                  134.1 ms   (NEW DEFAULT)

Verdict: the fold itself is the win; sliced-gram and concat-halos are
anti-optimizations (hlo_stats self-times of the ops they remove did not
translate 1:1 — the DUS pair and the weight broadcast were fused into
consumers). Defaults after this experiment: PHASE trunk, tw gram,
DUS halos; opt-ins SEGMIF_AB=strips_trunk / strips_gram_slice /
halos_concat (all parity-tested in tests/test_models.py).
"""
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


FLAGS = ("SEGMIF_AB",)


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps_raw))(variables)

    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    combos = [
        ("phase trunk, new fold (DEFAULT)", {}),
        ("strips: tw gram + DUS halos",
         {"SEGMIF_AB": "strips_trunk"}),
        ("strips: sliced gram + DUS halos",
         {"SEGMIF_AB": "strips_trunk,strips_gram_slice"}),
        ("strips: tw gram + concat halos",
         {"SEGMIF_AB": "strips_trunk,halos_concat"}),
        ("strips: sliced gram + concat halos",
         {"SEGMIF_AB": "strips_trunk,strips_gram_slice,halos_concat"}),
    ]
    for name, env in combos:
        for f in FLAGS:
            os.environ.pop(f, None)
        os.environ.update(env)
        t = timed_scan(fuse_served, (ir, vis) + tuple(taps))
        print(f"{name:46s}: {t:7.1f} ms  ({b / t * 1000:.1f} pairs/s core)",
              flush=True)


if __name__ == "__main__":
    main()
