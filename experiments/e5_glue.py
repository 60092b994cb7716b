"""E5: layout-glue micro-variants (phase merge, concat, taps) — round 2.

The round-1 profile put the fusion net's non-conv glue at ~82 ms of 196
(copies 29 + reshapes 28 + DUS 18 + pad/relu 7; OPTIMIZATION.md addendum 6).
This battery measures the remaining candidates one TPU window can decide:

 1. phase_merge formulations (reshape/transpose vs middle-dim scatter vs
    interleave-by-concat) at the tail's [B,4,hp,wp,128] shape.
 2. concat-then-merge vs merge-then-concat for the two 64-ch branches.
 3. full-res tap path (old) vs native-res tap path (new: proj at encoder
    res + resize_bilinear_phase) — validates the round-2 taps change
    in isolation.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import _cache

_cache.enable()


def timed(fn, shapes_dtypes, iters=20, reps=3):
    @jax.jit
    def many(key):
        args = []
        for i, (s, dt) in enumerate(shapes_dtypes):
            k = jax.random.fold_in(key, i)
            args.append(jax.random.uniform(k, s, jnp.float32, -1, 1).astype(dt))

        def body(carry, _):
            out = fn(*[a + carry.astype(a.dtype) for a in args])
            return (jnp.max(out).astype(jnp.float32) * 1e-9).astype(
                jnp.float32), ()
        carry, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    key = jax.random.PRNGKey(0)
    float(many(key))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(key))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1000


def main():
    B, H, W = 8, 480, 640
    hp, wp = H // 2, W // 2
    dt = jnp.bfloat16

    from segmif_tpu.kernels.pallas_drdb import phase_merge

    # --- 1. phase_merge formulations at the tail shape -------------------
    def merge_rt(xp):                      # current: reshape+transpose
        return phase_merge(xp)

    def merge_concat(xp):
        # rows: interleave H by stacking (plane pairs) on a new axis;
        # cols likewise — all reshapes after two stacks
        b, _, h2, w2, c = xp.shape
        top = jnp.stack([xp[:, 0], xp[:, 1]], 3)      # [B,h2,w2,2,c] cols of row-even
        bot = jnp.stack([xp[:, 2], xp[:, 3]], 3)
        rows = jnp.stack([top, bot], 2)               # [B,h2,2,w2,2,c]
        return rows.reshape(b, 2 * h2, 2 * w2, c)

    for c in (64, 128):
        t_rt = timed(merge_rt, [((B, 4, hp, wp, c), dt)])
        t_cc = timed(merge_concat, [((B, 4, hp, wp, c), dt)])
        print(f"phase_merge c={c}: reshape/transpose {t_rt:.2f}  "
              f"stack-form {t_cc:.2f} ms", flush=True)

    # --- 2. concat-then-merge vs merge-then-concat ------------------------
    def cat_merge(a, b):
        return phase_merge(jnp.concatenate([a, b], -1))

    def merge_cat(a, b):
        return jnp.concatenate([phase_merge(a), phase_merge(b)], -1)

    shapes = [((B, 4, hp, wp, 64), dt), ((B, 4, hp, wp, 64), dt)]
    print(f"tail concat: cat->merge {timed(cat_merge, shapes):.2f}  "
          f"merge->cat {timed(merge_cat, shapes):.2f} ms", flush=True)

    # --- 3. tap path: full-res vs native-res ------------------------------
    from segmif_tpu.kernels.pallas_drdb import phase_split
    from segmif_tpu.ops.image import resize_bilinear, resize_bilinear_phase

    k1 = jax.random.uniform(jax.random.PRNGKey(7), (1, 1, 64, 64), dt)
    k2 = jax.random.uniform(jax.random.PRNGKey(8), (1, 1, 128, 64), dt)

    def conv1x1(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def tap_old(t1, t2):
        s1 = phase_split(conv1x1(resize_bilinear(t1, (H, W)), k1))
        s2 = phase_split(conv1x1(resize_bilinear(t2, (H, W)), k2))
        return s1 + s2

    def tap_new(t1, t2):
        s1 = resize_bilinear_phase(conv1x1(t1, k1), (H, W))
        s2 = resize_bilinear_phase(conv1x1(t2, k2), (H, W))
        return s1 + s2

    shapes = [((B, H // 4, W // 4, 64), dt), ((B, H // 8, W // 8, 128), dt)]
    print(f"taps (both stages, proj+split): full-res "
          f"{timed(tap_old, shapes):.2f}  native-res "
          f"{timed(tap_new, shapes):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
