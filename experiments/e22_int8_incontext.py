"""E22 (round 4): int8 DRDB path A/B at serving-step and fusion-core level.

e20 part 1 measured the raw int8 conv at 2.1x bf16 at the exact strip
shape. This decides the serving default: full serving step (precomputed
taps) and served-taps fusion core, bf16 DRDBs vs calibrated int8 DRDBs
(kernels/int8.py via quant='int8').

Run on v5e:  python experiments/e22_int8_incontext.py
"""
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402
from segmif_tpu.serving import quantize_for_serving  # noqa: E402


def timed_scan(fn, args, iters=8, reps=3):
    @jax.jit
    def many(*a):
        def body(carry, _):
            out = fn(*[x + carry.astype(x.dtype) for x in a[:2]], *a[2:])
            s = sum(jnp.mean(o.astype(jnp.float32)) for o in out) * 1e-7
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
    model_q, vars_q = quantize_for_serving(model, variables, (ir, vis))

    taps = jax.jit(lambda v, g: model.apply(
        v, g, method=JointPipeline.guide_taps_raw))(variables, vis)

    for label, m, v in (("bf16 DRDB (default)", model, variables),
                        ("int8 DRDB (calibrated)", model_q, vars_q)):
        # served-taps fusion core
        def core(ir_, vis_, t1, t2, m=m, v=v):
            fr, fy = m.apply(v, ir_, vis_, taps=(t1, t2),
                             method=JointPipeline.fuse)
            return (fr, fy)

        t = timed_scan(core, (ir, vis) + tuple(taps))
        print(f"fusion core,  {label:24s}: {t:7.1f} ms "
              f"({b / t * 1000:5.1f} pairs/s core)", flush=True)

        # full serving step (taps precomputed, fuse + segment)
        def step(ir_, vis_, t1, t2, m=m, v=v):
            fr, fy, logits = m.apply(v, ir_, vis_, taps=(t1, t2))
            return (fr, logits)

        t = timed_scan(step, (ir, vis) + tuple(taps))
        print(f"serving step, {label:24s}: {t:7.1f} ms "
              f"({b / t * 1000:5.1f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
