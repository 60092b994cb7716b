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


def test_spatial_fuse_padded_rows():
    """H not divisible by the shard count: pad rows must be masked out of
    convs and attention grams, reproducing the unpadded forward exactly."""
    mesh = make_mesh(data=4, model=1)
    h, w = 70, 32  # 70 % 4 != 0 -> padded to 72, 18 rows/shard
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
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_spatial_fuse_pipeline_matches_fuse_fn():
    """make_spatial_fuse_fn (the 1080p stretch serving path) must equal the
    single-device JointPipeline.fuse to fp tolerance."""
    from segmif_tpu.models.network import JointPipeline
    from segmif_tpu.parallel.spatial import make_spatial_fuse_fn
    from segmif_tpu.train.steps import make_fuse_fn

    mesh = make_mesh(data=4, model=1)
    b, h, w = 2, 64, 32
    ks = jax.random.split(KEY, 4)
    ir = jax.random.uniform(ks[0], (b, h, w, 1))
    vis = jax.random.uniform(ks[1], (b, h, w, 3))
    guide = jax.random.uniform(ks[2], (b, h, w, 3))
    model = JointPipeline("mit_b0", num_classes=9)
    variables = model.init(ks[3], ir, vis)

    ref_rgb, ref_y = make_fuse_fn(model)(variables, ir, vis, guide)
    got_rgb, got_y = make_spatial_fuse_fn(mesh, model)(variables, ir, vis,
                                                       guide)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               atol=2e-5)
