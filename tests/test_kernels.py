"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segmif_tpu.kernels.attention import (
    linear_cross_attention_xla,
    sr_attention_xla,
)
from segmif_tpu.kernels import pallas_attention as pa

KEY = jax.random.PRNGKey(0)


def _qkv(b, n, m, h, d, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(KEY, 3)
    q = jax.random.normal(k1, (b, n, h, d), dtype)
    k = jax.random.normal(k2, (b, m, h, d), dtype)
    v = jax.random.normal(k3, (b, m, h, d), dtype)
    return q, k, v


def test_sr_attention_xla_is_softmax_attention():
    q, k, v = _qkv(1, 4, 3, 2, 8)
    out = sr_attention_xla(q, k, v, 0.5)
    # naive per-head reference
    for h in range(2):
        logits = np.asarray(q)[0, :, h, :] @ np.asarray(k)[0, :, h, :].T * 0.5
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        expect = p @ np.asarray(v)[0, :, h, :]
        np.testing.assert_allclose(np.asarray(out)[0, :, h, :], expect,
                                   atol=1e-5)


def test_linear_cross_attention_context_form():
    q, k, v = _qkv(1, 6, 5, 2, 4)
    out = linear_cross_attention_xla(q, k, v, 0.3)
    for h in range(2):
        kh = np.asarray(k)[0, :, h, :]
        vh = np.asarray(v)[0, :, h, :]
        ctx = kh.T @ vh * 0.3
        e = np.exp(ctx - ctx.max(axis=0, keepdims=True))
        ctx = e / e.sum(axis=0, keepdims=True)
        expect = np.asarray(q)[0, :, h, :] @ ctx
        np.testing.assert_allclose(np.asarray(out)[0, :, h, :], expect,
                                   atol=1e-5)


@pytest.mark.parametrize("n,m,h,d", [
    (512, 128, 2, 64),     # aligned
    (300, 300, 8, 64),     # stage-4-like: N and M both unaligned
    (1200, 300, 5, 64),    # stage-3-like
])
def test_sr_attention_pallas_interpret_matches_xla(monkeypatch, n, m, h, d):
    q, k, v = _qkv(1, n, m, h, d)
    scale = d**-0.5
    expect = sr_attention_xla(q, k, v, scale)
    orig = pa.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pa.pl, "pallas_call", interp)
    got = pa._sr_attention_fwd_impl(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)


def test_sr_attention_pallas_grad_matches_xla(monkeypatch):
    q, k, v = _qkv(1, 64, 32, 2, 16)
    scale = 0.25
    orig = pa.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pa.pl, "pallas_call", interp)

    def f_pallas(q, k, v):
        return jnp.sum(pa.sr_attention_pallas(q, k, v, scale) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(sr_attention_xla(q, k, v, scale) ** 2)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_supports_shape_gate():
    assert pa.supports((1, 19200, 1, 64), (1, 300, 1, 64))
    assert pa.supports((1, 300, 8, 64), (1, 300, 8, 64))
    # giant unreduced KV would blow VMEM -> falls back
    assert not pa.supports((1, 19200, 1, 64), (1, 19200, 1, 64))


def _crosspath_pair(seed=0, b=2, n=192, c=64):
    from segmif_tpu.models.fusion import CrossPath

    rng = np.random.default_rng(seed)
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    fast = CrossPath(c, num_heads=8, interaction="both")
    variables = fast.init(jax.random.PRNGKey(seed), x1, x2, s)
    return fast, variables, (x1, x2, s)


def test_crosspath_folded_matches_modular():
    """The folded pure-function CrossPath equals the modular attention path
    (same params; the modular path runs under return_context=True)."""
    from segmif_tpu.models.fusion import CrossPath

    fast, variables, (x1, x2, s) = _crosspath_pair()
    o1f, o2f = fast.apply(variables, x1, x2, s)
    modular = CrossPath(64, num_heads=8, interaction="both",
                        return_context=True)
    o1m, o2m, _ = modular.apply(variables, x1, x2, s)
    np.testing.assert_allclose(np.asarray(o1f), np.asarray(o1m), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2f), np.asarray(o2m), atol=2e-5)


def test_crosspath_pallas_interpret_matches_folded(monkeypatch):
    """Two-pass Pallas FFM (interpret mode) == folded XLA, fwd exactness
    incl. a token count that doesn't divide the tile."""
    from segmif_tpu.kernels import pallas_ffm as pf

    fast, variables, (x1, x2, s) = _crosspath_pair(n=200)
    ref1, ref2 = fast.apply(variables, x1, x2, s)

    orig = pf.pl.pallas_call
    monkeypatch.setattr(pf.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(pf, "TILE_N", 64)
    p = variables["params"]
    wd = {
        "wp1": p["channel_proj1"]["kernel"], "bp1": p["channel_proj1"]["bias"],
        "wp2": p["channel_proj2"]["kernel"], "bp2": p["channel_proj2"]["bias"],
        "wp3": p["channel_proj3"]["kernel"], "bp3": p["channel_proj3"]["bias"],
        "wkv3": p["cross_attn"]["kv_seg"]["kernel"],
        "wkv1": p["cross_attn2"]["kv1"]["kernel"],
        "wkv2": p["cross_attn2"]["kv2"]["kernel"],
        "we1": p["end_proj1"]["kernel"], "be1": p["end_proj1"]["bias"],
        "we2": p["end_proj2"]["kernel"], "be2": p["end_proj2"]["bias"],
        "ln1_scale": p["norm1"]["scale"], "ln1_bias": p["norm1"]["bias"],
        "ln2_scale": p["norm2"]["scale"], "ln2_bias": p["norm2"]["bias"],
    }
    scale = (64 // 8)**-0.5
    g1, g2 = pf._crosspath_fused_impl(x1, x2, s, wd, scale, 8)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(ref1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(ref2), atol=3e-5)
