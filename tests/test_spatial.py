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

pytestmark = pytest.mark.slow  # multi-device compiles / full train steps

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
    # untrained-params fused_y has magnitude ~24; psum'd grams reorder the
    # fp sums, so tolerance is relative (measured maxdiff 4.2e-5, spread
    # uniformly over rows — summation noise, not a halo/boundary defect)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               atol=1e-4)


def test_stretch_cli_synthetic(capsys):
    """The 1080p stretch CLI end-to-end (tiny size + mit_b0 so the CPU
    compile stays bounded; the 1080p/mit_b5 path is the same code at the
    config's resolution)."""
    from segmif_tpu.cli.stretch import main

    main(["--config", "configs/stretch_1080p.yaml", "--spatial", "4",
          "--synthetic", "--size", "64", "64", "--backbone", "mit_b0"])
    out = capsys.readouterr().out
    assert "stretch 1080p OK" in out
    assert "backbone=mit_b0" in out
    assert "fused shape (1, 64, 64, 3)" in out
