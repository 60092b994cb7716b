"""E1: int8 vs bf16 conv microbench at DRDB shapes (8x480x640 + phase planes).

XLA conv cost at these shapes == im2col HBM traffic (OPTIMIZATION.md round-1
addendum 2): 9*cin bytes/px at ~430 GB/s. int8 halves the im2col bytes vs
bf16 and doubles MXU rate — IF XLA lowers int8 convs to the int8 MXU path.
Measure, don't assume.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed(fn, shapes_dtypes, iters=20, reps=3):
    """shapes_dtypes: list of (shape, dtype). Inputs are generated ON DEVICE
    inside the jitted program — the axon tunnel rejects large host-shipped
    buffers (HTTP 413 above ~200 MB) and re-ships inputs per call anyway."""
    @jax.jit
    def many(key):
        args = []
        for i, (s, dt) in enumerate(shapes_dtypes):
            k = jax.random.fold_in(key, i)
            if dt == jnp.int8:
                args.append(jax.random.randint(k, s, -127, 127, jnp.int32)
                            .astype(jnp.int8))
            else:
                args.append(jax.random.uniform(k, s, jnp.float32,
                                               -1, 1).astype(dt))
        def body(carry, _):
            out = fn(*[a + carry.astype(a.dtype) for a in args])
            # data-dependence so the loop can't be hoisted/elided
            return (jnp.max(out).astype(jnp.int32) % 2).astype(jnp.int8), ()
        carry, _ = lax.scan(body, jnp.int8(0), None, length=iters)
        return carry

    key = jax.random.PRNGKey(0)
    int(many(key))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        int(many(key))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000  # ms per call


def conv(x, w, dil=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_i8(x, w, dil=1):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    shapes = [
        ("full 64->160 dil2", (8, 480, 640, 64), (3, 3, 64, 160), 2),
        ("phase 64->160", (32, 240, 320, 64), (3, 3, 64, 160), 1),
        ("strip 64->160", (128, 70, 320, 64), (3, 3, 64, 160), 1),
        ("full 128->64", (8, 480, 640, 128), (3, 3, 128, 64), 1),
    ]
    for name, xs, ws, dil in shapes:
        t_bf = timed(lambda a, b: conv(a, b, dil),
                     [(xs, jnp.bfloat16), (ws, jnp.bfloat16)])
        try:
            t_i8 = timed(lambda a, b: conv_i8(a, b, dil),
                         [(xs, jnp.int8), (ws, jnp.int8)])
        except Exception as e:
            t_i8 = float("nan")
            print(name, "int8 FAILED:", type(e).__name__, str(e)[:120])
        print(f"{name}: bf16 {t_bf:.2f} ms  int8 {t_i8:.2f} ms "
              f"(ratio {t_bf / t_i8 if t_i8 == t_i8 else float('nan'):.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
