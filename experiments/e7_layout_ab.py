"""E7: A/B the round-2 layout changes in-context on the TPU.

Variants of the served-taps fusion core (the 153.6 ms hot block):
  tokens   — round-1 behavior: FFM flattens to [B, N, C] tokens
             (SEGMIF_AB=ffm_tokens)
  plane    — NEW default: rank-polymorphic folded FFM on phase planes
             (kills the 4 x 5.5 ms token relayouts seen in the profile)
  +nostrip — plane FFM + DRDB chain on whole phase planes (no halo strips)
  +splitrs — plane FFM + reshape/transpose phase_split form

Each variant is a fresh jit (env vars are read at trace time).
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


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    taps = jax.jit(lambda v: model.apply(
        v, vis, method=JointPipeline.guide_taps))(variables)

    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    combos = [
        ("tokens (round-1)", {"SEGMIF_AB": "ffm_tokens"}),
        ("plane FFM (new default)", {}),
        ("plane + drdb-nostrip", {"SEGMIF_AB": "drdb_phase_nostrip"}),
        ("plane + split-reshape", {"SEGMIF_AB": "phase_split_reshape"}),
    ]
    for name, env in combos:
        for k in ("SEGMIF_AB",):
            os.environ.pop(k, None)
        os.environ.update(env)
        t = timed_scan(fuse_served, (ir, vis) + tuple(taps))
        print(f"{name:28s}: {t:7.1f} ms  ({b / t * 1000:.1f} pairs/s core)",
              flush=True)


if __name__ == "__main__":
    main()
