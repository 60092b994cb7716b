"""Attention compute kernels with a single dispatch point.

Two attention patterns exist in this framework (both from the reference):

 1. `sr_attention` — softmax attention where KV comes from a spatially
    reduced grid (MiT encoder, /root/reference/core/mix_transformer.py:94-115).
    O(N*M) with M = N / sr^2.
 2. `linear_cross_attention` — "context vector" linear attention: a global
    [D, D] context per head is built from K/V (softmax over the feature axis)
    and queries read it (/root/reference/core/model_fusion.py:263-288).
    O(N*D^2), independent of KV length.

Both have an XLA einsum path (works on any backend; XLA already fuses the
softmax chain) and a fused Pallas TPU path for large token counts
(`segmif_tpu.kernels.pallas_attention`). Dispatch is by backend + shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    import os

    if os.environ.get("SEGMIF_DISABLE_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # no backend initialized
        return False


def sr_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """q: [B, N, H, D]; k, v: [B, M, H, D]. Returns [B, N, H, D].

    Plain softmax(q k^T * scale) v, computed per head. Layout is kept
    [B, N, H, D] end-to-end so XLA emits no physical transposes around the
    surrounding Dense layers.
    """
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def linear_cross_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                               scale: float, return_ctx: bool = False):
    """q, k, v: [B, N, H, D]. Returns [B, N, H, D] (and the [B, H, D, D]
    context matrix when return_ctx — the "attention map" the reference's
    visualization variants expose, model_fusion.py:538-624).

    ctx = softmax((k^T v) * scale, axis=feature-of-k); out = q @ ctx.
    The context matrix is [B, H, D, D] — tiny — so this is O(N*D^2) and
    the FLOPs live in two MXU-friendly matmuls.
    """
    ctx = jnp.einsum("bmhd,bmhe->bhde", k, v) * scale
    ctx = jax.nn.softmax(ctx.astype(jnp.float32), axis=-2).astype(q.dtype)
    out = jnp.einsum("bnhd,bhde->bnhe", q, ctx)
    if return_ctx:
        return out, ctx
    return out


def sr_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float) -> jnp.ndarray:
    """Dispatching sr-attention. See module docstring."""
    if _on_tpu():
        from .pallas_attention import sr_attention_pallas, supports
        if supports(q.shape, k.shape):
            return sr_attention_pallas(q, k, v, scale)
    return sr_attention_xla(q, k, v, scale)


def linear_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           scale: float) -> jnp.ndarray:
    """Dispatching linear cross-attention. See module docstring."""
    return linear_cross_attention_xla(q, k, v, scale)
