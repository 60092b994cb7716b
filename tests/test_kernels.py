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
