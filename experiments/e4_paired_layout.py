"""E4: W-paired lane layout for the fusion trunk — producer-emits-layout.

Round-1 finding (OPTIMIZATION.md addendum 7): the [B,H,W,C] -> [B,H,W/2,2C]
"pairs into lanes" reshape costs ~4.4 ms per tensor because the TPU lane
tiling must be physically rewritten; the fix is to make PRODUCERS emit the
paired layout. In NHWC the pairing is a flat-index identity, so any op that
WRITES its output with 2C lanes gets it for free:

 - conv1 as a wide strided conv: kernel width k+1, stride 2 in W, weights
   duplicated into channel blocks [0:C]=even-w taps, [C:2C]=odd-w taps.
 - DRDB dilated(2) convs: W-parity never mixes, so on the paired layout the
   W-dilation collapses to dense-in-wp with BLOCK-DIAGONAL weights
   [kh,kw,2C,2Cout] (H keeps rhs_dilation 2, or H-parity planes).
 - FFM linear attention: gram over true tokens == the [2C,2C] paired gram's
   two diagonal C-blocks summed; context application == q2 @ blockdiag(ctx).

This experiment measures each primitive vs the current phase-plane path.
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


def conv(x, w, dil=(1, 1), stride=(1, 1), pad="SAME"):
    return lax.conv_general_dilated(
        x, w, stride, pad, rhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def block_diag_weights(w):
    """[kh,kw,C,Co] -> [kh,kw,2C,2Co] block-diagonal (parity groups)."""
    kh, kw, c, co = w.shape
    z = jnp.zeros_like(w)
    top = jnp.concatenate([w, z], -1)
    bot = jnp.concatenate([z, w], -1)
    return jnp.concatenate([top, bot], -2)


def main():
    B, H, W, C = 8, 480, 640, 64
    wp = W // 2
    dt = jnp.bfloat16

    # --- 1. conv1 (1 -> 32) + entry into paired layout -------------------
    def conv1_then_pair(x, w):
        y = conv(x, w)                       # [B,H,W,32]
        return y.reshape(B, H, wp, 64)       # pairs into lanes (relayout)

    def conv1_paired(x, w4):
        # wide strided conv: [kh=3, kw=4, 1, 64]; stride 2 in W emits
        # (even,odd) channel blocks directly
        return conv(x, w4, stride=(1, 2), pad=[(1, 1), (1, 2)])

    t_a = timed(conv1_then_pair, [((B, H, W, 1), dt), ((3, 3, 1, 32), dt)])
    t_b = timed(conv1_paired, [((B, H, W, 1), dt), ((3, 4, 1, 64), dt)])
    print(f"conv1: conv+pair {t_a:.2f} ms   wide-strided paired {t_b:.2f} ms",
          flush=True)

    # --- 2. DRDB-shape conv on phase planes vs paired layout -------------
    # phase-plane strips (current default): [128, 70, 320, 64] -> 160
    t_phase = timed(lambda x, w: conv(x, w),
                    [((128, 70, 320, 64), dt), ((3, 3, 64, 160), dt)])
    # paired, H in parity planes too, strips: [64, 70, 320, 128] -> 320 bd
    t_pair_hp = timed(
        lambda x, w: conv(x, block_diag_weights(w)),
        [((64, 70, 320, 128), dt), ((3, 3, 64, 160), dt)])
    # paired, H dense with dilation 2, full H strips: [32, 130, 320, 128]
    t_pair_hd = timed(
        lambda x, w: conv(x, block_diag_weights(w), dil=(2, 1)),
        [((32, 130, 320, 128), dt), ((3, 3, 64, 160), dt)])
    # paired via feature_group_count=2 (grouped-conv lowering)
    def grouped(x, w):
        return lax.conv_general_dilated(
            x, jnp.concatenate([w, w], -2).reshape(3, 3, 128, 160), (1, 1),
            "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2)
    t_pair_grp = timed(
        lambda x, w: grouped(x, w),
        [((64, 70, 320, 128), dt), ((3, 3, 64, 160), dt)])
    print(f"drdb-conv: phase-strip {t_phase:.2f}  paired-bd-Hphase "
          f"{t_pair_hp:.2f}  paired-bd-Hdil {t_pair_hd:.2f}  "
          f"paired-grouped {t_pair_grp:.2f} ms", flush=True)

    # --- 3. FFM gram on paired layout ------------------------------------
    N = H * wp // 4  # phase-plane token count per plane-batch element
    def gram_plain(k, v):
        return jnp.einsum("nc,nd->cd", k, v)
    def gram_paired(k2, v2):
        g2 = jnp.einsum("nc,nd->cd", k2, v2)   # [2C, 2C]
        return g2[:C, :C] + g2[C:, C:]
    t_g1 = timed(gram_plain, [((8 * N, C), dt), ((8 * N, C), dt)])
    t_g2 = timed(gram_paired, [((4 * N, 2 * C), dt), ((4 * N, 2 * C), dt)])
    print(f"gram: plain {t_g1:.2f}  paired {t_g2:.2f} ms", flush=True)

    # --- 4. final unpair (tail output, C small) ---------------------------
    def unpair(y):
        return y.reshape(B, H, W, 32)
    t_u = timed(unpair, [((B, H, wp, 64), dt)])
    print(f"unpair 64->32ch reshape: {t_u:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
