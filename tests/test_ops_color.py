import numpy as np
import jax.numpy as jnp

from segmif_tpu.ops import (
    minmax_stretch,
    recombine_fused,
    rgb_to_ycrcb,
    ycrcb_to_rgb,
)


def test_rgb_ycrcb_constants():
    # pure red/green/blue pixels against the BT.601-style formulas
    rgb = jnp.array([[[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]]])
    out = np.asarray(rgb_to_ycrcb(rgb))[0, 0]
    np.testing.assert_allclose(out[0], [0.299, (1 - 0.299) * 0.713 + 0.5, -0.299 * 0.564 + 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.587, -0.587 * 0.713 + 0.5, -0.587 * 0.564 + 0.5], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.114, -0.114 * 0.713 + 0.5, (1 - 0.114) * 0.564 + 0.5], atol=1e-6)


def test_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(0.1, 0.9, size=(2, 8, 9, 3)).astype(np.float32))
    back = ycrcb_to_rgb(rgb_to_ycrcb(rgb))
    # the reference inverse matrix is approximate, tolerance ~2e-3
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=5e-3)


def test_gray_maps_to_gray(rng):
    g = rng.uniform(0, 1, size=(1, 4, 4, 1)).astype(np.float32)
    rgb = jnp.asarray(np.repeat(g, 3, axis=-1))
    y = rgb_to_ycrcb(rgb)
    np.testing.assert_allclose(np.asarray(y[..., 0:1]), g, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[..., 1:]), 0.5, atol=1e-6)


def test_recombine_fused(rng):
    vis = jnp.asarray(rng.uniform(0, 1, size=(1, 6, 6, 3)).astype(np.float32))
    vis_ycrcb = rgb_to_ycrcb(vis)
    out = recombine_fused(vis_ycrcb[..., 0:1], vis_ycrcb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vis), atol=5e-3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_minmax_stretch(rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 5, 1)).astype(np.float32))
    s = minmax_stretch(x)
    assert abs(float(jnp.min(s))) < 1e-5
    assert abs(float(jnp.max(s)) - 1.0) < 1e-5
