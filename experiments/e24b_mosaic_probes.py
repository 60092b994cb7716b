"""E24b: bisect the int8 whole-DRDB kernel's Mosaic compile crash (HTTP 500
from the remote compiler gives no message) — try each suspect construct in
a minimal kernel on hardware."""
import traceback

import _cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache.enable()

ROWS, WPP, WP, C = 70, 322, 320, 64


def run(name, kernel, in_specs, out_shape, args, out_specs=None):
    try:
        f = pl.pallas_call(
            kernel, grid=(4,), in_specs=in_specs,
            out_specs=out_specs or pl.BlockSpec(
                (1,) + out_shape.shape[1:], lambda p: (p,) + (0,) * (
                    len(out_shape.shape) - 1), memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        jax.block_until_ready(jax.jit(f)(*args))
        r = float(jnp.sum(jax.jit(f)(*args).astype(jnp.float32)))
        print(f"{name}: OK ({r:.1f})", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    print(jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    xq = jax.random.randint(key, (4, ROWS, WPP, C), -127, 127,
                            jnp.int32).astype(jnp.int8)
    w = jax.random.randint(key, (9 * C, 160), -127, 127,
                           jnp.int32).astype(jnp.int8)
    vspec4 = pl.BlockSpec((1, ROWS, WPP, C), lambda p: (p, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    rep = pl.BlockSpec(memory_space=pltpu.VMEM)

    # (a) plain int8 dot [N, 64] @ [64, 160] -> i32
    def k_dot(x_ref, w_ref, o_ref):
        x = x_ref[0].reshape(ROWS * WPP, C)[:ROWS * WP]
        o_ref[0] = jax.lax.dot_general(
            x, w_ref[...][:C], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(ROWS, WP, 160)

    run("a int8 dot K=64", k_dot, [vspec4, rep],
        jax.ShapeDtypeStruct((4, ROWS, WP, 160), jnp.int32), (xq, w))

    # (b) sublane-offset int8 concat (src3)
    def k_src3(x_ref, o_ref):
        x = x_ref[0]
        s3 = jnp.concatenate([x[:, 0:WP], x[:, 1:WP + 1], x[:, 2:WP + 2]],
                             axis=-1)
        o_ref[0] = s3

    run("b int8 src3 concat", k_src3, [vspec4],
        jax.ShapeDtypeStruct((4, ROWS, WP, 3 * C), jnp.int8), (xq,))

    # (c) src9 + big dot K=576
    def k_src9dot(x_ref, w_ref, o_ref):
        x = x_ref[0]
        s3 = jnp.concatenate([x[:, 0:WP], x[:, 1:WP + 1], x[:, 2:WP + 2]],
                             axis=-1)
        z = jnp.zeros((1, WP, 3 * C), jnp.int8)
        s9 = jnp.concatenate([
            jnp.concatenate([z, s3[:-1]], 0), s3,
            jnp.concatenate([s3[1:], z], 0)], -1).reshape(ROWS * WP, 9 * C)
        o_ref[0] = jax.lax.dot_general(
            s9, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(ROWS, WP, 160)

    run("c src9 + dot K=576", k_src9dot, [vspec4, rep],
        jax.ShapeDtypeStruct((4, ROWS, WP, 160), jnp.int32), (xq, w))

    # (d) iota // wp mask + f32 epilogue + requant
    lo = jnp.zeros((4,), jnp.int32)
    hi = jnp.full((4,), 60, jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def k_mask(lo_ref, hi_ref, x_ref, o_ref):
        p = pl.program_id(0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (ROWS * WP, 1), 0)
        r = idx // WP
        m = ((r >= lo_ref[p]) & (r < hi_ref[p])).astype(jnp.float32)
        x = x_ref[0].reshape(ROWS * WPP, C)[:ROWS * WP].astype(jnp.float32)
        q = jnp.round(jax.nn.relu(x) * m * 0.5)
        o_ref[0] = jnp.clip(q, -127, 127).astype(jnp.int8
                                                 ).reshape(ROWS, WP, C)

    run("d smem mask + requant", k_mask, [smem, smem, vspec4],
        jax.ShapeDtypeStruct((4, ROWS, WP, C), jnp.int8), (lo, hi, xq))

    # (e) in-kernel jnp.pad of int8
    def k_pad(x_ref, o_ref):
        x = x_ref[0][:, 1:WP + 1]
        o_ref[0] = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))

    run("e int8 pad", k_pad, [vspec4],
        jax.ShapeDtypeStruct((4, ROWS, WP + 2, C), jnp.int8), (xq,))


if __name__ == "__main__":
    main()
