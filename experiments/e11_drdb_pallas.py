"""E11 (round 3): standalone DRDB A/B at model shapes — is a Pallas DRDB
worth building for the phase trunk (VERDICT round-2 next-step #2)?

The round-3 e8 profile of the 134 ms default core shows each DRDB at
~10.4 ms: one 3.2 ms conv fusion at 162 TF/s (compute SOL) plus ~7 ms of
HBM-bound tails at 33-95 TF/s, and ~10 ms of strip gather/scatter DUS
across the 4 DRDBs. Compute floor per DRDB (976 GFLOP at b8 480x640,
phase form) is ~6 ms at the measured 162 TF/s. A VMEM-resident fused
kernel that reads the input once could approach that; the round-1 fused
kernel (image-space tiles, pltpu.roll tap stacking) measured 40 ms vs 22
in-context and was shelved.

Times one DRDB application on [8, 480, 640, 64] bf16 (or its phase form)
for each available path, in-graph scan.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import _cache

_cache.enable()

from segmif_tpu.kernels.pallas_drdb import (  # noqa: E402
    _PHASE_HALO, _phase_strip_for, drdb_grouped_xla, drdb_pallas,
    drdb_phase_core, drdb_plane_core, phase_split)


def timed_scan(fn, x, iters=8, reps=3):
    @jax.jit
    def many(x):
        def body(carry, _):
            out = fn(carry)
            return out * 0.999 + carry * 0.001, ()
        carry, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(carry.astype(jnp.float32))
    float(many(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(x))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


def main():
    b, h, w_, c, g = 8, 480, 640, 64, 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, h, w_, c)).astype(np.float32),
                    jnp.bfloat16)
    wd = {}
    for i in range(5):
        cin = c + i * g
        wd[f"dconv{i + 1}"] = {
            "kernel": jnp.asarray(
                rng.normal(size=(3, 3, cin, g)).astype(np.float32) * 0.05,
                jnp.bfloat16),
            "bias": jnp.zeros((g,), jnp.bfloat16)}
    wd["bottleneck"] = {"kernel": jnp.asarray(
        rng.normal(size=(1, 1, c + 5 * g, c)).astype(np.float32) * 0.05,
        jnp.bfloat16), "bias": jnp.zeros((c,), jnp.bfloat16)}

    xp = phase_split(x)
    hp, wp = h // 2, w_ // 2
    strip = _phase_strip_for(hp, wp)
    print(f"strip={strip} halo={_PHASE_HALO}")

    t = timed_scan(lambda t_: drdb_phase_core(t_, wd, strip), xp)
    print(f"phase-strips XLA core (default, phase in/out): {t:6.2f} ms")
    t = timed_scan(lambda t_: drdb_plane_core(
        t_.reshape(b * 4, hp, wp, c), wd).reshape(xp.shape), xp)
    print(f"whole-plane XLA core (phase in/out):           {t:6.2f} ms")
    t = timed_scan(lambda t_: drdb_grouped_xla(t_, wd), x)
    print(f"grouped XLA (image in/out):                    {t:6.2f} ms")
    t = timed_scan(lambda t_: drdb_pallas(t_, wd), x)
    print(f"fused Pallas r1 kernel (image in/out):         {t:6.2f} ms")


if __name__ == "__main__":
    main()
