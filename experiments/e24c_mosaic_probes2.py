"""E24c: narrow the Mosaic remote-compile crashes from e24b (a-d FAIL,
e OK). Separates int8-ness from structure."""
import _cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache.enable()

N, C = 22400, 64


def run(name, kernel, in_specs, out_shape, args):
    try:
        f = pl.pallas_call(
            kernel, grid=(4,), in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1,) + out_shape.shape[1:],
                lambda p: (p,) + (0,) * (len(out_shape.shape) - 1),
                memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        r = float(jnp.sum(jax.jit(f)(*args).astype(jnp.float32)))
        print(f"{name}: OK ({r:.1f})", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: "
              f"{str(e)[:90]}".replace("\n", " "), flush=True)


def main():
    print(jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    x8 = jax.random.randint(key, (4, N, C), -127, 127, jnp.int32
                            ).astype(jnp.int8)
    x16 = jax.random.uniform(key, (4, N, C), jnp.float32).astype(jnp.bfloat16)
    w8 = jax.random.randint(key, (C, 160), -127, 127, jnp.int32
                            ).astype(jnp.int8)
    w16 = jax.random.uniform(key, (C, 160), jnp.float32).astype(jnp.bfloat16)
    sp8 = pl.BlockSpec((1, N, C), lambda p: (p, 0, 0),
                       memory_space=pltpu.VMEM)
    rep = pl.BlockSpec(memory_space=pltpu.VMEM)

    def k_dot8(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    run("a2 pure int8 dot (preflattened)", k_dot8, [sp8, rep],
        jax.ShapeDtypeStruct((4, N, 160), jnp.int32), (x8, w8))

    def k_dot16(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    run("a3 pure bf16 dot (preflattened)", k_dot16, [sp8, rep],
        jax.ShapeDtypeStruct((4, N, 160), jnp.float32), (x16, w16))

    def k_cat8(x_ref, o_ref):
        x = x_ref[0]
        o_ref[0] = jnp.concatenate([x, x, x], axis=-1)

    run("b2 int8 lane concat x3 (no offsets)", k_cat8, [sp8],
        jax.ShapeDtypeStruct((4, N, 3 * C), jnp.int8), (x8,))

    def k_cat16(x_ref, o_ref):
        x = x_ref[0]
        o_ref[0] = jnp.concatenate([x, x, x], axis=-1)

    run("b3 bf16 lane concat x3", k_cat16, [sp8],
        jax.ShapeDtypeStruct((4, N, 3 * C), jnp.bfloat16), (x16,))

    def k_iota(x_ref, o_ref):
        idx = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
        r = idx // 320
        m = (r >= 5).astype(jnp.float32)
        o_ref[0] = x_ref[0].astype(jnp.float32) * m

    run("d2 iota//320 mask (f32 out)", k_iota, [sp8],
        jax.ShapeDtypeStruct((4, N, C), jnp.float32), (x16,))

    def k_rs(x_ref, o_ref):
        x = x_ref[0].reshape(70, 320, C)
        o_ref[0] = x.reshape(N, C)

    run("f int8 rank3<->rank2 reshape", k_rs, [sp8],
        jax.ShapeDtypeStruct((4, N, C), jnp.int8), (x8,))

    def k_i32out(x_ref, o_ref):
        o_ref[0] = x_ref[0].astype(jnp.int32) * 2

    run("g int8 -> i32 convert out", k_i32out, [sp8],
        jax.ShapeDtypeStruct((4, N, C), jnp.int32), (x8,))


if __name__ == "__main__":
    main()
