"""E24d: which dx-shift construction compiles in Mosaic for int8 rank-3
tensors? (The whole-DRDB kernel dies on 'result/input offset mismatch on
non-concat dimension' wherever sublane-offset views reach a lane concat.)"""
import functools

import _cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache.enable()

ROWS, WP, C = 70, 320, 64


def run(name, kernel, extra_scratch=None):
    try:
        f = pl.pallas_call(
            kernel, grid=(4,),
            in_specs=[pl.BlockSpec((1, ROWS, WP, C), lambda p: (p, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ROWS, WP, 3 * C),
                                   lambda p: (p, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, ROWS, WP, 3 * C), jnp.int8),
            scratch_shapes=extra_scratch or [],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        key = jax.random.PRNGKey(0)
        x = jax.random.randint(key, (4, ROWS, WP, C), -127, 127,
                               jnp.int32).astype(jnp.int8)
        r = float(jnp.sum(jax.jit(f)(x).astype(jnp.float32)))
        print(f"{name}: OK ({r:.1f})", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")
        key_part = msg[msg.find("Not implemented"):][:80] if \
            "Not implemented" in msg else msg[:80]
        print(f"{name}: FAIL {type(e).__name__}: {key_part}", flush=True)


def main():
    print(jax.devices(), flush=True)

    # p1: dy-stack only (row shifts, no sublane shifts)
    def k1(x_ref, o_ref):
        x = x_ref[0]
        z = jnp.zeros((1, WP, C), jnp.int8)
        up = jnp.concatenate([z, x[:-1]], axis=0)
        dn = jnp.concatenate([x[1:], z], axis=0)
        o_ref[0] = jnp.concatenate([up, x, dn], axis=-1)

    run("p1 dy row-shift lane concat", k1)

    # p2: dx shift via axis-1 concat, then lane concat (current form)
    def k2(x_ref, o_ref):
        x = x_ref[0]
        zw = jnp.zeros((ROWS, 1, C), jnp.int8)
        left = jnp.concatenate([x[:, 1:], zw], axis=1)
        right = jnp.concatenate([zw, x[:, :WP - 1]], axis=1)
        o_ref[0] = jnp.concatenate([right, x, left], axis=-1)

    run("p2 dx axis1-concat lane concat", k2)

    # p3: dx shift via pad, then lane concat
    def k3(x_ref, o_ref):
        x = x_ref[0]
        left = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
        right = jnp.pad(x[:, :WP - 1], ((0, 0), (1, 0), (0, 0)))
        o_ref[0] = jnp.concatenate([right, x, left], axis=-1)

    run("p3 dx pad lane concat", k3)

    # p4: scratch-ref store, load slices, lane concat
    def k4(x_ref, o_ref, scr):
        x = x_ref[0]
        scr[:, 1:WP + 1] = x
        scr[:, 0] = jnp.zeros((ROWS, C), jnp.int8)
        scr[:, WP + 1] = jnp.zeros((ROWS, C), jnp.int8)
        right = scr[:, 0:WP]
        left = scr[:, 2:WP + 2]
        o_ref[0] = jnp.concatenate([right, x, left], axis=-1)

    run("p4 scratch store/load lane concat", k4,
        [pltpu.VMEM((ROWS, WP + 2, C), jnp.int8)])

    # p5: sublane roll via i32 lane-bitcast
    def k5(x_ref, o_ref):
        x = x_ref[0]
        xi = pltpu.bitcast(x, jnp.int32)            # [ROWS, WP, C//4]
        lf = pltpu.bitcast(pltpu.roll(xi, -1, 1), jnp.int8)
        rt = pltpu.bitcast(pltpu.roll(xi, 1, 1), jnp.int8)
        o_ref[0] = jnp.concatenate([rt, x, lf], axis=-1)

    run("p5 i32-bitcast sublane roll", k5)


if __name__ == "__main__":
    main()
