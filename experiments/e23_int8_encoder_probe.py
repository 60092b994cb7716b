"""E23 (round 4): do int8 MATMULS also hit the 2x MXU path at mit_b3
encoder shapes? (VERDICT r3 #1 second target: encoder matmuls.)

The serving step's seg-of-fused branch is ~29 ms (e12); its FLOPs are
mostly stage-1/2 Mlp fc1/fc2 and qkv/proj dense layers at small C
(64/128). int8 convs measured 2.1x (e20); matmuls lower through a
different XLA path, so measure before building anything.

Shapes (b8 480x640, mit_b3): stage-1 tokens N=19200, C=64; stage-2
N=4800, C=128; stage-3 N=1200, C=320.
"""
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()


def timed(fn, make_args, iters=32, reps=3):
    @jax.jit
    def many(key):
        args = make_args(key)

        def body(carry, _):
            out = fn(*args)
            return (jnp.max(out).astype(jnp.float32) * 1e-12 + carry), ()
        carry, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    key = jax.random.PRNGKey(0)
    float(many(key))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(key))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


def main():
    print(jax.devices(), flush=True)
    b = 8
    shapes = [
        ("stage1 fc1 [8,19200,64]->256", (b * 19200, 64), (64, 256)),
        ("stage1 fc2 [8,19200,256]->64", (b * 19200, 256), (256, 64)),
        ("stage2 fc1 [8,4800,128]->512", (b * 4800, 128), (128, 512)),
        ("stage3 qkv [8,1200,320]->960", (b * 1200, 320), (320, 960)),
    ]
    for name, xs, ws in shapes:
        def mk_bf(key, xs=xs, ws=ws):
            k1, k2 = jax.random.split(key)
            return (jax.random.uniform(k1, xs, jnp.float32, -1, 1
                                       ).astype(jnp.bfloat16),
                    jax.random.uniform(k2, ws, jnp.float32, -1, 1
                                       ).astype(jnp.bfloat16))

        def mk_i8(key, xs=xs, ws=ws):
            k1, k2 = jax.random.split(key)
            return (jax.random.randint(k1, xs, -127, 127, jnp.int32
                                       ).astype(jnp.int8),
                    jax.random.randint(k2, ws, -127, 127, jnp.int32
                                       ).astype(jnp.int8))

        t_bf = timed(lambda a, c: a @ c, mk_bf)
        sc = jnp.float32(1 / 300.0)
        t_i8 = timed(
            lambda a, c: (jnp.dot(a, c, preferred_element_type=jnp.int32)
                          .astype(jnp.float32) * sc).astype(jnp.bfloat16),
            mk_i8)
        print(f"{name}: bf16 {t_bf:6.3f} ms  int8+dequant {t_i8:6.3f} ms "
              f"({t_bf / t_i8:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
