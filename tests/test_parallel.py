"""Sharding tests on the 8-device virtual CPU mesh: DP batch sharding and
GSPMD tensor parallelism must not change numerics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmif_tpu.models.mit import MIT_VARIANTS, MixVisionTransformer
from segmif_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    put_batch,
    put_replicated,
)

pytestmark = pytest.mark.slow  # 8-device mesh compiles take minutes on CPU

KEY = jax.random.PRNGKey(0)


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2
    mesh2 = make_mesh(model=2)  # data = all/2
    assert mesh2.shape[DATA_AXIS] * 2 == len(jax.devices())


def test_put_batch_sharded_and_fallback():
    mesh = make_mesh(data=4, model=2)
    batch = {"a": np.zeros((8, 3), np.float32),   # divisible -> sharded
             "b": np.zeros((3, 2), np.float32)}   # not -> replicated
    out = put_batch(mesh, batch)
    assert out["a"].sharding.spec == batch_sharding(mesh).spec
    assert out["b"].sharding.spec == jax.sharding.PartitionSpec()


def test_tp_sharding_preserves_numerics():
    """mit_b0 forward must produce identical results with TP param sharding
    (XLA inserts the collectives; math unchanged)."""
    model = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
    x = jax.random.uniform(KEY, (2, 32, 32, 3))
    params = model.init(KEY, x)

    ref = model.apply(params, x)

    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(mesh, params, tensor_parallel=True)
    sharded_params = jax.tree.map(jax.device_put, params, shardings)
    # check that at least one kernel actually got model-sharded
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding)))
    assert any(MODEL_AXIS in str(s) for s in specs)

    xs = put_batch(mesh, x)
    out = jax.jit(model.apply)(sharded_params, xs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_gradient_matches_single_device():
    """Data-parallel loss/grad over the mesh == single-device loss/grad."""
    model = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
    x = jax.random.uniform(KEY, (8, 32, 32, 3))
    params = model.init(KEY, x)

    def loss_fn(p, xb):
        feats = model.apply(p, xb)
        return sum(jnp.mean(f**2) for f in feats)

    g_ref = jax.grad(loss_fn)(params, x)

    mesh = make_mesh(data=8, model=1)
    xp = put_batch(mesh, x)
    pp = put_replicated(mesh, params)
    g_dp = jax.jit(jax.grad(loss_fn))(pp, xp)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
