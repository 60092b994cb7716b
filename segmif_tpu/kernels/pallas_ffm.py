"""Fused Pallas TPU kernels for the CrossPath interactive attention (FFM).

The folded CrossPath (models/fusion.py, reference model_fusion.py:329-361)
is HBM-bandwidth-bound in XLA: the six projected half-features y_i/u_i
(each [N, 64] at N = 480*640*batch) round-trip through HBM between the
channel projections, the gram reductions, and the context applications —
~6 GB of traffic for ~0.4 TFLOP of work (measured at its XLA roofline,
14.3 ms/round on v5e; OPTIMIZATION.md).

This module computes the identical math in TWO streaming passes that read
the three 64-channel inputs straight from HBM and keep every intermediate
in VMEM:

 pass A (grams): per token tile, r_i = relu(x_i @ Wp_i + bp_i) ([T, 128]);
   accumulate the three [128, 128] gram matrices r_i^T r_i in a float32
   scratch across the tile grid (grid iterates batch-slowest, so the
   accumulator resets at tile 0 of each image and flushes at the last).
   The needed 64x64 blocks (y1^T y1, y2^T y2, u3^T u3) are sliced outside.

 (XLA, tiny): per-head softmax contexts from the grams
   (attention.linear_ctx_blockdiag_from_gram) and the end-projection fold,
   exactly as the folded XLA path.

 pass B (apply): recompute r_i on the fly, apply the four folded [C, C]
   contexts as two K=128 matmuls per branch (the context matrices are
   zero-padded to [128, 64] so the y3/u_i halves select themselves — no
   lane slicing), add the end bias, residual, and LayerNorm, and write the
   two outputs.

Traffic drops to read-inputs-twice + write-outputs (~2.5 GB); backward
recomputes through the XLA folded path under jax.custom_vjp.

MEASURED OUTCOME (v5e, see crosspath_apply): XLA compiles the folded form
to the same recompute strategy and runs at the achievable-bandwidth floor;
this kernel is currently ~2x slower than that floor, so it is opt-in, not
the default. Kept because it is exact, tested, and the right structure if
Mosaic's small-matmul tiles improve.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..utils.ab import ab
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import linear_ctx_blockdiag_from_gram

TILE_N = 4096  # best of 512..4096 sweep on v5e (8192 fails Mosaic compile)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------- folded XLA

def folded_weights_from_params(p: Dict) -> Dict:
    """CrossPath param tree (the {channel_proj*, cross_attn, cross_attn2,
    end_proj*, norm*} tree models.fusion.CrossPath creates — e.g.
    variables['params']['fusion']['ffm']['cross']) -> the folded weight dict
    crosspath_folded_xla consumes. Lets non-Flax callers (parallel/
    spatial.py's shard_map forward) run the SAME folded compute path as the
    model."""
    w = {}
    for i in (1, 2, 3):
        cp = p[f"channel_proj{i}"]
        w[f"wp{i}"], w[f"bp{i}"] = cp["kernel"], cp["bias"]
    w["wkv3"] = p["cross_attn"]["kv_seg"]["kernel"]
    w["wkv1"] = p["cross_attn2"]["kv1"]["kernel"]
    w["wkv2"] = p["cross_attn2"]["kv2"]["kernel"]
    for i in (1, 2):
        w[f"we{i}"] = p[f"end_proj{i}"]["kernel"]
        w[f"be{i}"] = p[f"end_proj{i}"]["bias"]
        w[f"ln{i}_scale"] = p[f"norm{i}"]["scale"]
        w[f"ln{i}_bias"] = p[f"norm{i}"]["bias"]
    return w


def crosspath_folded_xla(x1, x2, s, w: Dict, scale: float, num_heads: int,
                         token_weight=None, psum_axis=None,
                         gram_slice=None):
    """Pure-function folded CrossPath ('both' interaction), the ground truth
    for the Pallas path and its backward. x1, x2, s: [B, ..., C] (C = dim) —
    RANK-POLYMORPHIC: any leading layout (tokens [B, N, C], phase planes
    [B, 4, hp, wp, C], strips) works, because every op touches only the
    channel dim. Keeping the caller's layout matters on TPU: materializing a
    [B, N, C] token tensor lets XLA assign it a transposed {1,2,0} layout to
    serve the gram dots, which costs 4 full-tensor relayout reshapes
    (~5.5 ms each at 480x640 b8 — the largest single ops in the round-2
    profile; see OPTIMIZATION.md round-2 addendum 7).

    The half-projections y_i/u_i are NEVER materialized: the grams are
    [2C, 2C] blocks of the full r_i gram, and the context applications are
    K=2C matmuls against zero-padded [2C, C] folded matrices — the r-half
    slice round-trips were 4.4 ms + extra HBM reads in the round-3 profile
    (OPTIMIZATION.md addendum 3).

    token_weight (optional, 0/1, broadcastable against x1's leading dims —
    e.g. [1|B, N] for tokens): rows with weight 0 are dropped from the GRAM
    reductions (each image pixel counted exactly once); their OUTPUT rows
    are NOT masked and are meaningless — callers must refresh or drop such
    rows afterwards (spatial parallelism's pad rows).

    gram_slice (optional, callable t -> t'): an alternative to token_weight
    when the dropped rows form a static slice of the leading layout — the
    gram reads the sliced view directly instead of materializing a weight
    broadcast. NOTE measured SLOWER in-context than the weight multiply on
    the strips trunk (e10: XLA materializes the strided row window), so it
    is opt-in (SEGMIF_AB=strips_gram_slice). Output rows outside the slice
    are meaningless, as with token_weight.

    psum_axis (optional): a shard_map axis name over which the token set is
    sharded; the gram partial sums are `psum`ed so every shard applies the
    identical GLOBAL context — spatially-sharded attention stays exact
    (parallel/spatial.py)."""
    dim = x1.shape[-1]
    dt = x1.dtype
    if x1.ndim - 2 > 4:
        raise ValueError(
            "crosspath_folded_xla supports at most 4 leading layout dims "
            f"(got input rank {x1.ndim})")
    lead = "uvxy"[:x1.ndim - 2]  # einsum letters for the leading layout
    gspec = f"b{lead}c,b{lead}d->bcd"
    aspec = f"b{lead}c,bcd->b{lead}d"
    tw = None
    if token_weight is not None:
        tw = token_weight[..., None].astype(dt)
        if tw.ndim != x1.ndim:
            raise ValueError(
                f"token_weight rank {token_weight.ndim} does not match "
                f"input leading dims (input rank {x1.ndim})")

    def proj(x, i):
        return jax.nn.relu(x @ w[f"wp{i}"].astype(dt)
                           + w[f"bp{i}"].astype(dt))

    r1 = proj(x1, 1)
    r2 = proj(x2, 2)
    r3 = proj(s, 3)

    def gram(t):
        t = gram_slice(t) if gram_slice is not None else t
        if tw is not None:
            t = t * (gram_slice(tw) if gram_slice is not None else tw)
        g = jnp.einsum(gspec, t, t,
                       preferred_element_type=jnp.float32)
        if psum_axis is not None:
            g = jax.lax.psum(g, psum_axis)
        return g

    g1 = gram(r1)   # [2C, 2C]; y-block = [:C, :C], u-block = [C:, C:]
    g2 = gram(r2)
    g3 = gram(r3)
    bd_s = linear_ctx_blockdiag_from_gram(g3[:, dim:, dim:], w["wkv3"],
                                          scale, num_heads)
    bd_1 = linear_ctx_blockdiag_from_gram(g1[:, :dim, :dim], w["wkv1"],
                                          scale, num_heads)
    bd_2 = linear_ctx_blockdiag_from_gram(g2[:, :dim, :dim], w["wkv2"],
                                          scale, num_heads)

    z = jnp.zeros_like(bd_s, dtype=dt)

    def fold_top(bd, we_half):
        # y-half selector: r @ [[M], [0]] == r[..., :C] @ M
        m = (bd @ we_half.astype(jnp.float32)).astype(dt)
        return jnp.concatenate([m, z], axis=-2)

    def fold_bot(bd, we_half):
        # u-half selector: r @ [[0], [M]] == r[..., C:] @ M
        m = (bd @ we_half.astype(jnp.float32)).astype(dt)
        return jnp.concatenate([z, m], axis=-2)

    def ln(t, i):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(t32 * t32, -1, keepdims=True) - mu * mu,
                          0.0)
        nrm = (t32 - mu) * jax.lax.rsqrt(var + 1e-5)
        return (nrm * w[f"ln{i}_scale"].astype(jnp.float32)
                + w[f"ln{i}_bias"].astype(jnp.float32)).astype(dt)

    o1 = (jnp.einsum(aspec, r3, fold_top(bd_1, w["we1"][:dim]))
          + jnp.einsum(aspec, r1, fold_bot(bd_s, w["we1"][dim:]))
          + w["be1"].astype(dt))
    o2 = (jnp.einsum(aspec, r3, fold_top(bd_2, w["we2"][:dim]))
          + jnp.einsum(aspec, r2, fold_bot(bd_s, w["we2"][dim:]))
          + w["be2"].astype(dt))
    return ln(x1 + o1, 1), ln(x2 + o2, 2)


# -------------------------------------------------------------- pass A ----

def _grams_kernel(x1, x2, s, wp, bp, g_ref, acc, *, n_true, tiles):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    t = x1.shape[1]
    row0 = ti * t
    wpv = wp[...]
    bpv = bp[...]

    def accum(i, x):
        r = jax.nn.relu(jax.lax.dot_general(
            x[0], wpv[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bpv[i, 0])
        if n_true % t:
            rows = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) + row0
            r = jnp.where(rows < n_true, r, 0.0)
        r16 = r.astype(x.dtype)
        acc[i] += jax.lax.dot_general(
            r16, r16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    accum(0, x1)
    accum(1, x2)
    accum(2, s)

    @pl.when(ti == tiles - 1)
    def _():
        g_ref[0] = acc[...]


def _grams_pallas(x1, x2, s, wp, bp):
    """x_i: [B, N, C]; wp: [3, C, 2C]; bp: [3, 1, 2C] -> [B, 3, 2C, 2C] f32
    gram matrices of r_i = relu(x_i @ wp_i + bp_i)."""
    b, n, c = x1.shape
    n_pad = _round_up(n, TILE_N)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x1, x2, s = (jnp.pad(t, pad) for t in (x1, x2, s))
    tiles = n_pad // TILE_N
    tspec = pl.BlockSpec((1, TILE_N, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grams_kernel, n_true=n, tiles=tiles),
        grid=(b, tiles),
        in_specs=[tspec, tspec, tspec, wspec, wspec],
        out_specs=pl.BlockSpec((1, 3, 2 * c, 2 * c),
                               lambda bi, ti: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, 2 * c, 2 * c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, 2 * c, 2 * c), jnp.float32)],
        # the cross-tile scratch accumulator (reset at ti==0, flush at
        # ti==tiles-1) REQUIRES sequential grid execution on both dims —
        # pin it so a future megacore 'parallel' annotation can't silently
        # corrupt the accumulation
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=b * n_pad * (3 * 2 * c * 2 * c * 2 + 3 * c * 2 * c * 2),
            bytes_accessed=3 * b * n_pad * c * x1.dtype.itemsize,
            transcendentals=0,
        ),
    )(x1, x2, s, wp, bp)


# -------------------------------------------------------------- pass B ----

def _apply_kernel(x1, x2, s, wp, bp, mats, be, lnp, o1_ref, o2_ref):
    wpv = wp[...]
    bpv = bp[...]
    mv = mats[0]
    bev = be[...]
    lnv = lnp[...]

    def proj(x, i):
        return jax.nn.relu(jax.lax.dot_general(
            x[0], wpv[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bpv[i, 0])

    r1 = proj(x1, 1 - 1).astype(x1.dtype)
    r2 = proj(x2, 2 - 1).astype(x1.dtype)
    r3 = proj(s, 3 - 1).astype(x1.dtype)

    def ctx(a, b_, i, j):
        return (jax.lax.dot_general(a, mv[i], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(b_, mv[j], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))

    o1 = ctx(r3, r1, 0, 1) + bev[0:1]
    o2 = ctx(r3, r2, 2, 3) + bev[1:2]

    def ln(x, o, i):
        t = x[0].astype(jnp.float32) + o
        mu = jnp.mean(t, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(t * t, -1, keepdims=True) - mu * mu, 0.0)
        nrm = (t - mu) * jax.lax.rsqrt(var + 1e-5)
        return nrm * lnv[i, 0:1] + lnv[i, 1:2]

    o1_ref[0] = ln(x1, o1, 0).astype(o1_ref.dtype)
    o2_ref[0] = ln(x2, o2, 1).astype(o2_ref.dtype)


def _apply_pallas(x1, x2, s, wp, bp, mats, be, lnp):
    """mats: [B, 4, 2C, C] folded contexts (zero-padded rows); be: [2, C];
    lnp: [2, 2, C] LayerNorm (scale, bias) pairs -> (o1, o2) [B, N, C]."""
    b, n, c = x1.shape
    n_pad = _round_up(n, TILE_N)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x1, x2, s = (jnp.pad(t, pad) for t in (x1, x2, s))
    tiles = n_pad // TILE_N
    tspec = pl.BlockSpec((1, TILE_N, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 4, 2 * c, c), lambda bi, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, TILE_N, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM)
    o1, o2 = pl.pallas_call(
        _apply_kernel,
        grid=(b, tiles),
        in_specs=[tspec, tspec, tspec, wspec, wspec, mspec, wspec, wspec],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((b, n_pad, c), x1.dtype)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=b * n_pad * (3 * c * 2 * c * 2 + 4 * 2 * c * c * 2),
            bytes_accessed=5 * b * n_pad * c * x1.dtype.itemsize,
            transcendentals=0,
        ),
    )(x1, x2, s, wp, bp, mats, be, lnp)
    if n_pad != n:
        o1, o2 = o1[:, :n], o2[:, :n]
    return o1, o2


# ------------------------------------------------------------- assembled ----

def _pack_weights(w: Dict, dtype):
    wp = jnp.stack([w["wp1"], w["wp2"], w["wp3"]]).astype(dtype)
    bp = jnp.stack([w["bp1"], w["bp2"], w["bp3"]])[:, None, :].astype(dtype)
    return wp, bp


def _crosspath_fused_impl(x1, x2, s, w: Dict, scale: float, num_heads: int):
    dim = x1.shape[-1]
    dt = x1.dtype
    wp, bp = _pack_weights(w, dt)
    grams = _grams_pallas(x1, x2, s, wp, bp)  # [B, 3, 2C, 2C] f32
    g_y1 = grams[:, 0, :dim, :dim]
    g_y2 = grams[:, 1, :dim, :dim]
    g_u3 = grams[:, 2, dim:, dim:]
    bd_s = linear_ctx_blockdiag_from_gram(g_u3, w["wkv3"], scale, num_heads)
    bd_1 = linear_ctx_blockdiag_from_gram(g_y1, w["wkv1"], scale, num_heads)
    bd_2 = linear_ctx_blockdiag_from_gram(g_y2, w["wkv2"], scale, num_heads)

    def fold(bd, we_half):
        return bd @ we_half.astype(jnp.float32)

    z = jnp.zeros_like(bd_s)
    # zero-padded [2C, C] so r3/r_i rows select the y3/u_i halves in-kernel
    mats = jnp.stack([
        jnp.concatenate([fold(bd_1, w["we1"][:dim]), z], 1),   # r3 -> y3 part
        jnp.concatenate([z, fold(bd_s, w["we1"][dim:])], 1),   # r1 -> u1 part
        jnp.concatenate([fold(bd_2, w["we2"][:dim]), z], 1),
        jnp.concatenate([z, fold(bd_s, w["we2"][dim:])], 1),
    ], 1).astype(dt)  # [B, 4, 2C, C]
    be = jnp.stack([w["be1"], w["be2"]]).astype(jnp.float32)
    lnp = jnp.stack([
        jnp.stack([w["ln1_scale"], w["ln1_bias"]]),
        jnp.stack([w["ln2_scale"], w["ln2_bias"]]),
    ]).astype(jnp.float32)
    return _apply_pallas(x1, x2, s, wp, bp, mats, be, lnp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def crosspath_fused(x1, x2, s, w: Dict, scale: float, num_heads: int):
    """Two-pass fused CrossPath. Same math as crosspath_folded_xla."""
    return _crosspath_fused_impl(x1, x2, s, w, scale, num_heads)


def _fwd(x1, x2, s, w, scale, num_heads):
    return _crosspath_fused_impl(x1, x2, s, w, scale, num_heads), (x1, x2, s,
                                                                   w)


def _bwd(scale, num_heads, res, g):
    x1, x2, s, w = res
    _, vjp = jax.vjp(
        lambda a, b, c, ww: crosspath_folded_xla(a, b, c, ww, scale,
                                                 num_heads), x1, x2, s, w)
    return vjp(g)


crosspath_fused.defvjp(_fwd, _bwd)


def crosspath_apply(x1, x2, s, w: Dict, scale: float, num_heads: int,
                    token_weight=None, gram_slice=None):
    """Dispatcher. DEFAULT IS THE FOLDED XLA PATH — measured on v5e at
    B=2, N=307200 (in-graph scan): folded XLA 2.65 ms/round vs fused
    Pallas 5.0 ms (pass A 3.3 / pass B 3.5 ms across TILE_N 512..4096),
    against a 2.52 ms elementwise-sweep floor. XLA already rematerializes
    the relu projections (same read-inputs-twice strategy as the two-pass
    kernel) and hits the chip's ~400 GB/s achievable HBM bandwidth; the
    Mosaic lowering of the gram/apply tiles does not. Pallas path kept
    exact + opt-in (SEGMIF_AB=ffm_pallas) for future Mosaic revisions."""
    import os

    from .attention import _on_tpu

    if (token_weight is None and gram_slice is None
            and ab("ffm_pallas") and _on_tpu()):
        if x1.ndim > 3:  # the fused kernel tiles [B, N, C] tokens
            shp = x1.shape
            flat = lambda t: t.reshape(shp[0], -1, t.shape[-1])  # noqa: E731
            o1, o2 = crosspath_fused(flat(x1), flat(x2), flat(s), w, scale,
                                     num_heads)
            return o1.reshape(shp), o2.reshape(shp)
        return crosspath_fused(x1, x2, s, w, scale, num_heads)
    return crosspath_folded_xla(x1, x2, s, w, scale, num_heads, token_weight,
                                gram_slice=gram_slice)
