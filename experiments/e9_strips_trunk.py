"""E9 (round 3): A/B the STRIP-PERSISTENT fusion trunk now that the folded
FFM is weight-aware.

Round 2 measured the strips trunk SLOWER than the phase trunk — but back
then a non-None token_weight forced the FFM onto the token-flattening path
(4x full-tensor relayouts). crosspath_folded_xla now takes the owned-row
weight in ANY leading layout, so the strips trunk keeps its layout through
the FFM: zero plane<->strip transitions between the conv and attention
segments (the per-DRDB strip gather/scatter was ~24 ms in the round-2
profile, OPTIMIZATION.md addendum 7).

Measured on the ACTUAL serving hot path (native-res raw taps precomputed
outside the loop, = bench.py --serving inner loop). Fresh jit per variant
(env flags are trace-time).
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
        v, vis, method=JointPipeline.guide_taps_raw))(variables)

    def fuse_served(ir_, vis_, t1, t2):
        fr, fy = model.apply(variables, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
        return fr + fy.mean()

    # measured 2026-08-19 (v5e, raw served taps): phase 152.5 ms / strips
    # 139.6 ms with the OLD (slice-materializing) FFM fold -> strips was
    # briefly the default; e10 then measured the no-half-materialization
    # fold at phase 134.1 / strips-best 142.1, flipping the default back
    # to phase (SEGMIF_AB=strips_trunk is now the opt-IN).
    combos = [
        ("phase trunk (default)", {}),
        ("strips trunk + weighted folded FFM", {"SEGMIF_AB": "strips_trunk"}),
    ]
    for name, env in combos:
        os.environ.pop("SEGMIF_AB", None)
        os.environ.update(env)
        t = timed_scan(fuse_served, (ir, vis) + tuple(taps))
        print(f"{name:38s}: {t:7.1f} ms  ({b / t * 1000:.1f} pairs/s core)",
              flush=True)


if __name__ == "__main__":
    main()
