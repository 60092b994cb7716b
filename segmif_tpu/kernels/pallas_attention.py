"""Fused Pallas TPU kernel for MiT spatially-reduced attention.

The sr-attention pattern (/root/reference/core/mix_transformer.py:94-115)
has queries over the full token grid (N up to 19,200 at 480x640, 129,600 at
1080p) but K/V from an sr-strided reduction (M = N / sr^2 — only a few
hundred rows). That shape regime makes the whole KV block VMEM-resident, so
the kernel is a ONE-PASS softmax-attention per query block: no online
rescaling, no HBM round-trip for the [N, M] logits (which is exactly what
XLA materializes if left alone — the win of this kernel is removing that
N x M logits traffic).

Grid: (B, H, N_pad / BLOCK_N). Each program:
  q [BLOCK_N, D] x k [M_pad, D]^T -> logits (f32, MXU)
  masked softmax over the static M columns (VPU)
  probs x v [M_pad, D] -> out (MXU)

The [B, N, H, D] layout is consumed directly via BlockSpec index maps —
no physical transposes around the kernel.

Backward (training) recomputes through the XLA path under jax.custom_vjp:
correct, and the backward matmuls are MXU-bound anyway.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 256
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sr_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_true: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if k.shape[0] != m_true:  # mask the M padding columns
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < m_true, logits, -jnp.inf)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - mx)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / s
    o_ref[0] = out.astype(o_ref.dtype)


def _sr_attention_fwd_impl(q, k, v, scale: float):
    b, n, h, d = q.shape
    m = k.shape[1]
    n_pad = _round_up(n, BLOCK_N)
    m_pad = _round_up(m, _LANE)
    # [B, N, H, D] -> [B*H, N, D]: Mosaic wants a plain squeezable leading
    # dim, and the transpose is one cheap relayout vs. the N x M logits
    # HBM traffic this kernel removes
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    if n_pad != n:
        qt = jnp.pad(qt, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        kt = jnp.pad(kt, ((0, 0), (0, m_pad - m), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, m_pad - m), (0, 0)))

    grid = (b * h, n_pad // BLOCK_N)
    out = pl.pallas_call(
        functools.partial(_sr_attn_kernel, scale=scale, m_true=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_N, d), lambda gi, ni: (gi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda gi, ni: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda gi, ni: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_N, d), lambda gi, ni: (gi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * m_pad * d,
            bytes_accessed=(2 * qt.size + 2 * kt.size) * q.dtype.itemsize,
            transcendentals=b * h * n_pad * m_pad,
        ),
    )(qt, kt, vt)
    out = out[:, :n] if n_pad != n else out
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sr_attention_pallas(q, k, v, scale: float):
    """q: [B, N, H, D]; k, v: [B, M, H, D] -> [B, N, H, D]."""
    return _sr_attention_fwd_impl(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _sr_attention_fwd_impl(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    from .attention import sr_attention_xla

    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: sr_attention_xla(a, b, c, scale), q, k, v)
    return vjp(g)


sr_attention_pallas.defvjp(_fwd, _bwd)


def supports(q_shape, k_shape) -> bool:
    """Shape regime this kernel handles: KV fits VMEM (reduced grid) and the
    head dim is a TPU-friendly width."""
    _, n, h, d = q_shape
    m = k_shape[1]
    m_pad = _round_up(m, _LANE)
    if d > 256:
        return False
    # q block + k + v + logits in f32 must fit well under the ~16MB VMEM
    vmem = (BLOCK_N * d + 2 * m_pad * d + BLOCK_N * m_pad) * 4
    return vmem < 8 * 1024 * 1024
