"""DRDB compute-path equivalence: naive chain vs grouped-XLA vs Pallas
(interpret mode), forward and gradient."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmif_tpu.kernels import pallas_drdb as pd


def _weights(rng, c=64, g=32):
    w = {}
    cin = c
    for i in range(5):
        w[f"dconv{i + 1}"] = {
            "kernel": jnp.asarray(rng.normal(size=(3, 3, cin, g),
                                             scale=0.05).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=(g,),
                                           scale=0.1).astype(np.float32)),
        }
        cin += g
    w["bottleneck"] = {
        "kernel": jnp.asarray(rng.normal(size=(1, 1, cin, c),
                                         scale=0.05).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(c,),
                                       scale=0.1).astype(np.float32)),
    }
    return w


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 96, 160, 64)).astype(np.float32))
    return x, _weights(rng)


def test_grouped_matches_naive(setup):
    x, w = setup
    ref = pd.drdb_xla(x, w)
    got = pd.drdb_grouped_xla(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_pallas_interpret_matches_naive(setup, monkeypatch):
    x, w = setup
    orig = pd.pl.pallas_call
    monkeypatch.setattr(pd.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    ref = pd.drdb_xla(x, w)
    got = pd._drdb_pallas_impl(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_pallas_non_tile_multiple_shape(monkeypatch):
    """Shapes that don't divide the tile geometry are padded + masked."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 100, 172, 64)).astype(np.float32))
    w = _weights(rng)
    orig = pd.pl.pallas_call
    monkeypatch.setattr(pd.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    ref = pd.drdb_xla(x, w)
    got = pd._drdb_pallas_impl(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_grouped_gradient_matches_naive(setup):
    x, w = setup
    x_small = x[:, :48, :48, :]

    def loss_naive(x, w):
        return jnp.sum(pd.drdb_xla(x, w) ** 2)

    def loss_grouped(x, w):
        return jnp.sum(pd.drdb_grouped_xla(x, w) ** 2)

    gn = jax.grad(loss_naive, argnums=(0, 1))(x_small, w)
    gg = jax.grad(loss_grouped, argnums=(0, 1))(x_small, w)
    for a, b in zip(jax.tree.leaves(gn), jax.tree.leaves(gg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_phase_strips_matches_naive(setup):
    """Parity-phase decomposition + halo strips is exact (incl. the
    re-zeroing of intermediates at the true image border)."""
    x, w = setup  # 96x160 -> phase planes 48x80
    ref = pd.drdb_xla(x, w)
    for strip in (48, 24, 12):
        got = pd.drdb_phase_xla(x, w, strip=strip)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)


def test_phase_strip_selection():
    # 480x640 image -> 240x320 phase planes: largest divisor with
    # (s + 10) * 320 <= 22400 is 60
    assert pd._phase_strip_for(240, 320) == 60
    # giant planes where no strip qualifies -> None (falls back to grouped)
    assert pd._phase_strip_for(7, 4096) is None


@pytest.mark.slow  # ~15 s; strips/tail parity is also covered in-model
def test_tail_strip_chain_matches_plain(monkeypatch):
    """The fusion tail's halo-strip conv chain is exact, including the
    re-zeroing of out-of-image halo rows between convs."""
    import segmif_tpu.models.fusion as fusion_mod
    from segmif_tpu.models.fusion import FusionNetwork

    rng = np.random.default_rng(3)
    ir = jnp.asarray(rng.uniform(size=(1, 48, 64, 1)).astype(np.float32))
    visy = jnp.asarray(rng.uniform(size=(1, 48, 64, 1)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(1, 48, 64, 64)).astype(np.float32))
    t2 = jnp.asarray(rng.normal(size=(1, 48, 64, 128)).astype(np.float32))
    net = FusionNetwork()
    variables = net.init(jax.random.PRNGKey(0), ir, visy, t1, t2)

    monkeypatch.setattr(fusion_mod, "_use_strips", lambda: False)
    ref = net.apply(variables, ir, visy, t1, t2)
    monkeypatch.setattr(fusion_mod, "_use_strips", lambda: True)
    got = net.apply(variables, ir, visy, t1, t2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_phase_split_merge_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 20, 5)).astype(np.float32))
    xp = pd.phase_split(x)
    assert xp.shape == (2, 4, 6, 10, 5)
    np.testing.assert_array_equal(np.asarray(pd.phase_merge(xp)),
                                  np.asarray(x))


def test_drdb_phase_core_matches_naive(setup):
    """The persistent phase-layout DRDB (strips internal) is exact vs the
    naive chain, including the zero-pad border semantics."""
    x, w = setup
    ref = pd.drdb_xla(x, w)
    got = pd.phase_merge(pd.drdb_apply_phase(pd.phase_split(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("lo,hi", [(0, 96), (16, 80), (16, 81), (3, 77)])
def test_drdb_apply_valid_rows_phase_matches_grouped(setup, lo, hi):
    """drdb_apply(valid_rows=...) must give identical results on the phase
    and grouped paths — incl. ODD row bounds, where the per-phase row
    parity matters (the spatial-parallel halo-extended-block case, where
    out-of-interval rows hold live producer data that must be re-zeroed
    around every conv)."""
    x, w = setup
    r = jnp.arange(x.shape[1])
    em = ((r >= lo) & (r < hi)).astype(x.dtype)[None, :, None, None]
    ref = pd.drdb_grouped_xla(x, w, edge_mask=em)
    got = pd.drdb_apply(x, w, mode="phase", valid_rows=(lo, hi))
    # compare only the in-image rows (out-of-interval output rows are
    # unspecified garbage in both paths, masked by the consumer)
    np.testing.assert_allclose(np.asarray(got)[:, lo:hi],
                               np.asarray(ref)[:, lo:hi], atol=1e-5)


def test_drdb_apply_valid_rows_traced():
    """valid_rows as traced scalars (jax.lax.axis_index in shard_map) must
    trace and match the static-bound result."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 64, 32, 16)).astype(np.float32))
    w = _weights(rng, c=16, g=8)
    ref = pd.drdb_apply(x, w, mode="phase", valid_rows=(10, 50))
    got = jax.jit(lambda x, lo, hi: pd.drdb_apply(
        x, w, mode="phase", valid_rows=(lo, hi)))(x, jnp.int32(10),
                                                  jnp.int32(50))
    np.testing.assert_allclose(np.asarray(got)[:, 10:50],
                               np.asarray(ref)[:, 10:50], atol=1e-6)


def test_tail_kernel_matches_xla_tail(setup):
    """Fused Pallas DRDB tail (interpret mode) == the concat+1x1+residual
    expression, forward and gradients (incl. bottleneck weight grads)."""
    from jax.experimental.pallas import tpu as pltpu

    from segmif_tpu.kernels import pallas_drdb_tail as pt

    rng = np.random.default_rng(3)
    _, w = setup
    s, rows, wp, c, g = 4, 16, 64, 64, 32  # S*R*W = 4096 = one kernel tile
    xs = jnp.asarray(rng.normal(size=(s, rows, wp, c)).astype(np.float32))
    rs = tuple(jnp.asarray(
        np.abs(rng.normal(size=(s, rows, wp, g))).astype(np.float32))
        for _ in range(5))
    wb = w["bottleneck"]["kernel"][0, 0]
    bb = w["bottleneck"]["bias"]

    ref = pt._tail_xla(xs, rs, wb, bb)
    with pltpu.force_tpu_interpret_mode():
        out = pt.drdb_tail_pallas(xs, *rs, wb, bb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_k(x, r, kw, kb):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(pt.drdb_tail_pallas(x, *r, kw, kb) ** 2)

    def loss_r(x, r, kw, kb):
        return jnp.sum(pt._tail_xla(x, r, kw, kb) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 2, 3))(xs, rs, wb, bb)
    gr = jax.grad(loss_r, argnums=(0, 2, 3))(xs, rs, wb, bb)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_growth_chain_custom_bwd_matches_autodiff(monkeypatch):
    """Round-5 target-grouped custom backward (_growth_chain): grads w.r.t.
    input, every kernel, and every bias must match plain XLA autodiff of the
    same grouped forward, with AND without the strips re-zero mask."""
    rng = np.random.default_rng(5)
    c, g = 16, 8
    w = _weights(rng, c=c, g=g)
    ks = tuple(w[f"dconv{i + 1}"]["kernel"] for i in range(5))
    bs = tuple(w[f"dconv{i + 1}"]["bias"] for i in range(5))
    x = jnp.asarray(rng.normal(size=(2, 20, 24, c)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(size=(2, 20, 1, 1)) > 0.2).astype(np.float32))

    for m in (None, mask):
        def loss_custom(x, ks, bs, m=m):
            rs = pd._growth_chain(1, x, ks, bs, m)
            return sum(jnp.sum(r ** 2) * (i + 1) for i, r in enumerate(rs))

        def loss_auto(x, ks, bs, m=m):
            rs = pd._growth_rs(x, ks, bs, m, 1)
            return sum(jnp.sum(r ** 2) * (i + 1) for i, r in enumerate(rs))

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, ks, bs)
        ga = jax.grad(loss_auto, argnums=(0, 1, 2))(x, ks, bs)
        for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_drdb_strips_core_grad_custom_vs_auto(monkeypatch):
    """End-to-end DRDB (strips core incl. tail): the opt-in
    SEGMIF_AB=drdb_bwd_tg custom-vjp path vs the default autodiff path —
    values AND grads agree."""
    rng = np.random.default_rng(6)
    c, g = 16, 8
    w = _weights(rng, c=c, g=g)
    x = jnp.asarray(rng.normal(size=(4, 14, 16, c)).astype(np.float32))
    m = jnp.asarray(
        (rng.uniform(size=(4, 14, 1, 1)) > 0.15).astype(np.float32))

    def loss(x, w):
        return jnp.sum(pd.drdb_strips_core(x, w, m) ** 2)

    monkeypatch.setenv("SEGMIF_AB", "drdb_bwd_tg")
    vc, gc = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
    monkeypatch.delenv("SEGMIF_AB", raising=False)
    va, ga = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
    assert abs(float(vc) - float(va)) < 1e-3
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
