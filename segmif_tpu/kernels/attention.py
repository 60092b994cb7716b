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


def linear_cross_attention_flat(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, scale: float, num_heads: int,
                                return_ctx: bool = False):
    """Head-folded linear cross-attention on FLAT [B, N, C] tensors.

    Mathematically identical to `linear_cross_attention_xla` on the
    head-split reshapes, but never materializes a [B, N, H, D] layout: with
    D = C/H = 8, every per-head op underfills the 128-wide TPU lanes by 16x
    and XLA pays physical relayouts around each reshape/transpose. Instead:

      * the per-head contexts k_h^T v_h are the H diagonal blocks of the
        single flat matmul k^T v ([B, C, C], tiny);
      * the per-head column softmax becomes one masked softmax on that flat
        matrix (entries outside the diagonal blocks -> 0);
      * `out_h = q_h @ ctx_h` for all heads is one [B, N, C] x [B, C, C]
        matmul against the resulting block-diagonal matrix (the zero blocks
        contribute exact fp zeros).

    Returns [B, N, C] (and the [B, H, D, D] context blocks when return_ctx,
    matching the reference's *_showAttention visualization output,
    model_fusion.py:538-624).
    """
    bd = linear_ctx_blockdiag(k, v, scale, num_heads).astype(q.dtype)
    out = jnp.einsum("bnc,bcd->bnd", q, bd)
    if return_ctx:
        b, c = bd.shape[0], bd.shape[-1]
        d = c // num_heads
        ctx = bd.astype(jnp.float32).reshape(
            b, num_heads, d, num_heads, d)[:, jnp.arange(num_heads), :,
                                           jnp.arange(num_heads), :]
        # advanced indices move to the front -> [H, B, D, D]; batch first
        return out, jnp.swapaxes(ctx, 0, 1)
    return out


def _blockdiag_softmax(ctx_full: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    c = ctx_full.shape[-1]
    blk = jnp.arange(c) // (c // num_heads)
    block_mask = blk[:, None] == blk[None, :]  # [C, C]
    logits = jnp.where(block_mask, ctx_full, -jnp.inf)
    return jax.nn.softmax(logits, axis=-2)  # zeros outside the blocks


def linear_ctx_blockdiag(k: jnp.ndarray, v: jnp.ndarray, scale: float,
                         num_heads: int) -> jnp.ndarray:
    """Block-diagonal [B, C, C] context matrix for flat linear attention
    (see `linear_cross_attention_flat`); float32."""
    ctx_full = jnp.einsum("bnc,bnd->bcd", k, v,
                          preferred_element_type=jnp.float32) * scale
    return _blockdiag_softmax(ctx_full, num_heads)


def linear_ctx_blockdiag_from_gram(gram: jnp.ndarray, wkv: jnp.ndarray,
                                   scale: float,
                                   num_heads: int) -> jnp.ndarray:
    """Block-diagonal context straight from a gram matrix.

    With K = X Wk and V = X Wv, the context K^T V equals Wk^T (X^T X) Wv —
    so given the [B, C, C] gram matrix of the source tokens and the fused
    [C, 2C] KV projection weight, the K/V projections never have to be
    materialized over the N tokens at all (saves ~1.9 GB of HBM traffic per
    projection at 480x640 batch 8). float32 throughout the tiny matrices.
    """
    c = gram.shape[-1]
    wk = wkv[:, :c].astype(jnp.float32)
    wv = wkv[:, c:].astype(jnp.float32)
    ctx_full = jnp.einsum("ce,bcd,df->bef", wk, gram, wv) * scale
    return _blockdiag_softmax(ctx_full, num_heads)


def token_gram(t: jnp.ndarray) -> jnp.ndarray:
    """[B, N, C] -> [B, C, C] gram matrix X^T X in float32."""
    return jnp.einsum("bnc,bnd->bcd", t, t,
                      preferred_element_type=jnp.float32)


def sr_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 scale: float) -> jnp.ndarray:
    """Dispatching sr-attention. See module docstring.

    The TPU/other split is staged with `lax.platform_dependent`, NOT a
    Python conditional on the current backend: a multi-platform serving
    export (cli/export --platforms tpu,cpu) lowers the SAME trace for
    every platform, and a trace-time `_on_tpu()` pick would bake the
    Pallas kernel into the CPU lowering (measured failure: "Only
    interpret mode is supported on CPU backend"). platform_dependent
    keeps per-platform branches; under a normal single-platform jit the
    branch is resolved at lowering with zero runtime cost.
    SEGMIF_DISABLE_PALLAS still forces the XLA path outright."""
    import os

    if os.environ.get("SEGMIF_DISABLE_PALLAS"):
        return sr_attention_xla(q, k, v, scale)
    from .pallas_attention import supports

    if not supports(q.shape, k.shape):
        return sr_attention_xla(q, k, v, scale)

    def tpu_path(q, k, v):
        from .pallas_attention import sr_attention_pallas

        return sr_attention_pallas(q, k, v, scale)

    return jax.lax.platform_dependent(
        q, k, v,
        tpu=tpu_path,
        default=lambda q, k, v: sr_attention_xla(q, k, v, scale))


def linear_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           scale: float) -> jnp.ndarray:
    """Dispatching linear cross-attention. See module docstring."""
    return linear_cross_attention_xla(q, k, v, scale)
