"""Spatial (sequence) parallelism: row-sharded fusion forward must equal the
single-device forward exactly (halo-exchanged convs, psum'd linear
attention)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmif_tpu.models.fusion import FusionNetwork
from segmif_tpu.parallel.mesh import make_mesh
from segmif_tpu.parallel.spatial import spatial_fuse

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_spatial_fuse_matches_single_device(n_shards):
    mesh = make_mesh(data=n_shards, model=1)
    h, w = 64, 48
    ks = jax.random.split(KEY, 5)
    ir = jax.random.uniform(ks[0], (h, w, 1))
    vis = jax.random.uniform(ks[1], (h, w, 1))
    tap1 = jax.random.uniform(ks[2], (h, w, 64))
    tap2 = jax.random.uniform(ks[3], (h, w, 128))

    model = FusionNetwork()
    variables = model.init(ks[4], ir[None], vis[None], tap1[None], tap2[None])
    ref = model.apply(variables, ir[None], vis[None], tap1[None],
                      tap2[None])[0]

    got = spatial_fuse(mesh, variables["params"], ir, vis, tap1, tap2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_spatial_fuse_batched_vmap():
    mesh = make_mesh(data=2, model=1)
    h, w, b = 32, 32, 2
    ks = jax.random.split(KEY, 5)
    ir = jax.random.uniform(ks[0], (b, h, w, 1))
    vis = jax.random.uniform(ks[1], (b, h, w, 1))
    tap1 = jax.random.uniform(ks[2], (b, h, w, 64))
    tap2 = jax.random.uniform(ks[3], (b, h, w, 128))
    model = FusionNetwork()
    variables = model.init(ks[4], ir, vis, tap1, tap2)
    ref = model.apply(variables, ir, vis, tap1, tap2)

    got = jax.vmap(lambda a, bb, c, d: spatial_fuse(
        mesh, variables["params"], a, bb, c, d))(ir, vis, tap1, tap2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
