"""E14 (round 3): in-context A/B of the fused Pallas DRDB tail
(kernels/pallas_drdb_tail.py) on the served-taps fusion core — the decision
measurement (standalone wins don't transfer; OPTIMIZATION.md round-1
addendum 5)."""
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

    for label, tok in (("XLA concat tail (default)", None),
                       ("PALLAS fused tail", "pallas_tail")):
        if tok:
            os.environ["SEGMIF_AB"] = tok
        t = timed_scan(core, (ir, vis) + tuple(taps))
        os.environ.pop("SEGMIF_AB", None)
        print(f"fusion core, {label:26s}: {t:7.1f} ms "
              f"({b / t * 1000:5.1f} pairs/s core)", flush=True)


if __name__ == "__main__":
    main()
