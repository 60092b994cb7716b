"""E17 (round 3): is the Pallas sr-attention kernel still the right TPU
default? Round-1 measured it "model-level neutral"; since then the rest of
the step got 4x faster, so the 5.5 ms of custom-call time (e12) is now a
visible fraction. A/B at the FULL default-step level (guide taps + fusion
+ seg — two encoder passes, where all the sr-attention lives)."""
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402


def timed(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*a):
        def body(carry, _):
            fr, fy, logits = fn(a[0] + carry, a[1] + carry)
            s = (jnp.mean(fr.astype(jnp.float32))
                 + jnp.mean(logits.astype(jnp.float32))) * 1e-7
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

    def full(ir_, vis_):
        return model.apply(variables, ir_, vis_)

    for label, env in (("Pallas sr-attention (default)", None),
                       ("XLA sr-attention", "SEGMIF_DISABLE_PALLAS")):
        if env:
            os.environ[env] = "1"
        t = timed(full, (ir, vis))
        if env:
            del os.environ[env]
        print(f"full default step, {label:30s}: {t:7.1f} ms "
              f"({b / t * 1000:5.1f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
