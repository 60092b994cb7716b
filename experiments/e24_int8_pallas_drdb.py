"""E24 (round 4): the fused int8 whole-DRDB Pallas kernel vs the int8 XLA
chain vs the bf16 default, ONE DRDB application at model shape (phase
strips of [8,480,640,64], in-graph scan) — the pre-registered kill
criterion of OPTIMIZATION.md round-4 addendum 2."""
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()


def timed(fn, args, iters=16, reps=3):
    @jax.jit
    def many(*a):
        def body(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            return (jnp.max(out).astype(jnp.float32) * 1e-9 + carry), ()
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
    import numpy as np

    from segmif_tpu.kernels.int8 import drdb_chain_int8, record_amax
    from segmif_tpu.kernels.pallas_drdb import (_phase_strips, phase_split,
                                                drdb_strips_core)
    from segmif_tpu.kernels.pallas_drdb_int8 import drdb_strips_int8_pallas

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    b, h, wd, c, g = 8, 480, 640, 64, 32
    w = {}
    cin = c
    for i in range(5):
        w[f"dconv{i+1}"] = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, cin, g))
                                  .astype(np.float32) * 0.05),
            "bias": jnp.zeros((g,), jnp.float32)}
        cin += g
    w["bottleneck"] = {"kernel": jnp.asarray(
        rng.normal(size=(1, 1, cin, c)).astype(np.float32) * 0.05),
        "bias": jnp.zeros((c,), jnp.float32)}
    wb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), w)

    x = jnp.asarray(rng.uniform(0, 1, (b, h, wd, c)).astype(np.float32))
    xs, m = _phase_strips(phase_split(x), 60, 5)
    xs16 = xs.astype(jnp.bfloat16)
    record = []
    drdb_strips_core(xs, w, m, record=record)
    amax = record_amax(record[0])

    t = timed(lambda a: drdb_strips_core(a, wb, m), (xs16,))
    print(f"bf16 strips chain (default): {t:7.2f} ms", flush=True)
    t = timed(lambda a: drdb_chain_int8(a, w, m, amax, dil=1), (xs16,))
    print(f"int8 XLA chain:              {t:7.2f} ms", flush=True)
    t = timed(lambda a: drdb_strips_int8_pallas(a, w, m, amax), (xs16,))
    print(f"int8 Pallas whole-DRDB:      {t:7.2f} ms", flush=True)

    # numerics sanity on-device (owned rows)
    ref = drdb_chain_int8(xs16, w, m, amax, dil=1)
    got = drdb_strips_int8_pallas(xs16, w, m, amax)
    d = jnp.max(jnp.abs((got.astype(jnp.float32)
                         - ref.astype(jnp.float32))[:, 5:-5]))
    print(f"kernel-vs-chain maxdiff (owned rows): {float(d):.5f}",
          flush=True)


if __name__ == "__main__":
    main()
