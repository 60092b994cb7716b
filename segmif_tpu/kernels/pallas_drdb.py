"""Fused Pallas TPU kernel for the DRDB (dilated residual dense block).

The DRDB (/root/reference/core/model_fusion.py:117-157) is the fusion
network's hot op: 5 dilated(2) 3x3 convs with dense concat growth (+32ch)
plus a 1x1 bottleneck, at FULL image resolution. Run naively through XLA it
is slow for two independent reasons, measured on v5e:

 1. every growth conv has only 32 output channels — 25% of the 128 MXU
    lanes (a 224->32 conv and a 224->128 conv take the SAME time);
 2. the dense concats materialize ever-wider activations in HBM
    (96/128/160/192/224 channels at 480x640).

This kernel fixes both:

 - conv-over-concat == sum of per-source convs, so each source's
   contributions to ALL later convs become one wide matmul
   (64->160, 32->128, 32->96, 32->64, 32->32 instead of five 32-wide convs);
 - the block runs on a VMEM-resident spatial tile with a halo: no
   intermediate ever touches HBM;
 - activations live in a FLAT [rows, channels] layout; the 9 dilated taps
   are realized as cheap `pltpu.roll`s, with the three dx-taps stacked into
   the contraction dim (K = 3*cin), so each conv is 3 MXU matmuls with no
   per-tap reshapes or unaligned window slices. Roll wrap-around garbage
   stays inside the halo ring (2 pixels/conv, 10 total < 12 halo).

Padding semantics are EXACTLY the reference chain's per-conv zero padding:
the wrapper zero-pads the image, and in-kernel masks re-zero activations
outside the true image bounds.

Backward: custom_vjp recomputes through the XLA reference chain.
"""
from __future__ import annotations

import functools as _functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.ab import ab

TILE_H = 96
TILE_W = 128
HALO = 12   # >= 10 (5 convs x reach 2); 12 keeps DMA block sizes 8-aligned


# ------------------------------------------------------------ reference ----

def drdb_xla(x: jnp.ndarray, w: Dict) -> jnp.ndarray:
    """Naive XLA chain — ground truth and the custom-vjp backward path.
    x: [B, H, W, C]; w: {dconv1..5: {kernel [3,3,Cin,G], bias}, bottleneck:
    {kernel [1,1,Ctot,C], bias}}."""
    feat = x
    for i in range(5):
        k = w[f"dconv{i + 1}"]["kernel"]
        b = w[f"dconv{i + 1}"]["bias"]
        y = jax.lax.conv_general_dilated(
            feat, k.astype(x.dtype), (1, 1), [(2, 2), (2, 2)],
            rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        feat = jnp.concatenate([feat, jax.nn.relu(y + b.astype(x.dtype))],
                               axis=-1)
    k = w["bottleneck"]["kernel"]
    b = w["bottleneck"]["bias"]
    y = jax.lax.conv_general_dilated(
        feat, k.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + jax.nn.relu(y + b.astype(x.dtype))


# --------------------------------------------------------------- kernel ----

def _group_weights(w: Dict, c: int, g: int):
    """Per-source grouped kernels, dx-taps stacked into the contraction dim:
    source s yields [3(dy), 3*cin_s, n_s]."""
    ks = [w[f"dconv{i + 1}"]["kernel"] for i in range(5)]
    grouped = []
    for s in range(5):
        lo = c + (s - 1) * g if s > 0 else 0
        hi = lo + (c if s == 0 else g)
        cols = jnp.concatenate([ks[i][:, :, lo:hi, :] for i in range(s, 5)],
                               axis=-1)  # [3, 3, cin_s, n_s]
        _, _, cin_s, n_s = cols.shape
        grouped.append(cols.reshape(3, 3 * cin_s, n_s))
    biases = jnp.concatenate([w[f"dconv{i + 1}"]["bias"] for i in range(5)])
    wb = w["bottleneck"]["kernel"][0, 0]  # [c+5g, c]
    bb = w["bottleneck"]["bias"]
    return grouped, biases.reshape(1, -1), wb, bb.reshape(1, -1)


def _make_kernel(c: int, g: int, img_h: int, img_w: int, out_dtype):
    sh = TILE_H + 2 * HALO
    sw = TILE_W + 2 * HALO
    rows = sh * sw

    def roll_rows(t, shift: int):
        """Static row roll. When the split point is 8-aligned (sublane
        tile), concat-of-slices copies at full throughput; otherwise fall
        back to tpu.rotate (32-bit only -> bitcast bf16 pairs, all shifts
        here are even)."""
        shift = shift % rows
        if shift == 0:
            return t
        if shift % 8 == 0 and (rows - shift) % 8 == 0:
            return jnp.concatenate([t[rows - shift:], t[:rows - shift]], 0)
        if t.dtype == jnp.float32 or t.dtype == jnp.int32:
            return pltpu.roll(t, shift, 0)
        assert t.dtype == jnp.bfloat16 and shift % 2 == 0 and rows % 2 == 0
        packed = pltpu.bitcast(t, jnp.int32)
        rolled = pltpu.roll(packed, (shift // 2) % (rows // 2), 0)
        return pltpu.bitcast(rolled, jnp.bfloat16)

    def conv(src_flat, wk):
        """src_flat: [rows, cin]; wk: [3, 3*cin, n]. Dilated(2) 3x3 conv in
        flat layout via ONE matmul: all 9 taps stacked into the contraction
        dim (K = 9*cin), so the K-accumulation stays inside the MXU instead
        of spilling a [rows, n] float32 accumulator between per-dy matmuls
        (the dominant VMEM traffic of the 3-matmul formulation)."""
        cin3 = wk.shape[1]
        n = wk.shape[-1]
        # stack dx = -2, 0, +2 neighbours into channels: [rows, 3*cin]
        up = roll_rows(src_flat, 2)          # out[i] = src[i-2]
        down = roll_rows(src_flat, rows - 2)  # out[i] = src[i+2]
        src3 = jnp.concatenate([up, src_flat, down], axis=-1)
        # stack dy = -1, 0, +1 rows of src3: [rows, 9*cin]; dy=0 tap first
        # needs roll +2sw (out[i] = src3[i - 2sw]), matching wk[0]
        src9 = jnp.concatenate([roll_rows(src3, (2 * sw) % rows), src3,
                                roll_rows(src3, (rows - 2 * sw) % rows)], -1)
        wk9 = wk.reshape(3 * cin3, n)
        return jax.lax.dot_general(
            src9, wk9, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(x_hbm, wx, w1, w2, w3, w4, bias, wb, bb, o_ref, xb, sem):
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.program_id(0), pl.ds(ti * TILE_H, sh),
                     pl.ds(tj * TILE_W, sw), :],
            xb, sem)
        dma.start()
        dma.wait()

        # canvas origin in TRUE image coordinates (shared by all tensors)
        row0 = ti * TILE_H - HALO
        col0 = tj * TILE_W - HALO

        # one [rows, 1] in-image indicator, broadcast-multiplied into each
        # r_i — the original chain's per-conv zero padding at image borders
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        r_im = row0 + idx // sw
        c_im = col0 + idx % sw
        ok = ((r_im >= 0) & (r_im < img_h) & (c_im >= 0) & (c_im < img_w))
        mask_val = ok.astype(out_dtype)

        def mask(t):
            return t * mask_val.astype(t.dtype)

        x3d = xb[...]                          # [sh, sw, c_pad]
        x = x3d.reshape(rows, x3d.shape[-1])[:, :c]
        bias_all = bias[...][0]

        yx = conv(x, wx[...])                  # [rows, 5g] f32
        r1 = mask(jax.nn.relu(yx[:, 0:g] + bias_all[0:g])).astype(out_dtype)
        y1 = conv(r1, w1[...])                 # [rows, 4g]
        r2 = mask(jax.nn.relu(yx[:, g:2 * g] + y1[:, 0:g]
                              + bias_all[g:2 * g])).astype(out_dtype)
        y2 = conv(r2, w2[...])                 # [rows, 3g]
        r3 = mask(jax.nn.relu(yx[:, 2 * g:3 * g] + y1[:, g:2 * g]
                              + y2[:, 0:g]
                              + bias_all[2 * g:3 * g])).astype(out_dtype)
        y3 = conv(r3, w3[...])                 # [rows, 2g]
        r4 = mask(jax.nn.relu(yx[:, 3 * g:4 * g] + y1[:, 2 * g:3 * g]
                              + y2[:, g:2 * g] + y3[:, 0:g]
                              + bias_all[3 * g:4 * g])).astype(out_dtype)
        y4 = conv(r4, w4[...])                 # [rows, g]
        # r5 needs no mask: only its in-image center feeds the output
        r5 = jax.nn.relu(yx[:, 4 * g:5 * g] + y1[:, 3 * g:4 * g]
                         + y2[:, 2 * g:3 * g] + y3[:, g:2 * g]
                         + y4 + bias_all[4 * g:5 * g]).astype(out_dtype)

        # bottleneck 1x1 over [x, r1..r5] + residual on the full canvas
        # (ring rows are garbage and sliced away below)
        wb_v = wb[...]

        def bdot(t, lo, hi):
            return jax.lax.dot_general(
                t, wb_v[lo:hi, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = bdot(x, 0, c)
        acc = acc + bdot(r1, c, c + g)
        acc = acc + bdot(r2, c + g, c + 2 * g)
        acc = acc + bdot(r3, c + 2 * g, c + 3 * g)
        acc = acc + bdot(r4, c + 3 * g, c + 4 * g)
        acc = acc + bdot(r5, c + 4 * g, c + 5 * g)
        acc = acc + bb[...][0]
        out = x.astype(jnp.float32) + jax.nn.relu(acc)
        out3d = out.astype(out_dtype).reshape(sh, sw, c)
        o_ref[0] = out3d[HALO:HALO + TILE_H, HALO:HALO + TILE_W, :]

    return kernel


def _cdiv(a, b):
    return -(-a // b)


def _drdb_pallas_impl(x: jnp.ndarray, w: Dict) -> jnp.ndarray:
    b, h, wid, c = x.shape
    g = w["dconv1"]["kernel"].shape[-1]
    th = _cdiv(h, TILE_H) * TILE_H
    tw = _cdiv(wid, TILE_W) * TILE_W
    dtype = x.dtype
    grouped, biases, wb, bb = _group_weights(w, c, g)
    grouped = [k.astype(dtype) for k in grouped]
    # channels padded to the 128-lane tile: HBM memref slices must be
    # lane-aligned
    c_pad = _cdiv(c, 128) * 128
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + th - h), (HALO, HALO + tw - wid),
                     (0, c_pad - c)))

    grid = (b, th // TILE_H, tw // TILE_W)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(c, g, h, wid, dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + [vspec] * 8,
        out_specs=pl.BlockSpec((1, TILE_H, TILE_W, c),
                               lambda bi, ti, tj: (bi, ti, tj, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, th, tw, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * HALO, TILE_W + 2 * HALO, c_pad), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * th * tw * (c * 5 * g + g * (4 + 3 + 2 + 1) * g)
            + 2 * b * th * tw * (c + 5 * g) * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, *grouped, biases.astype(dtype), wb.astype(dtype), bb.astype(dtype))
    return out[:, :h, :wid, :]


@jax.custom_vjp
def drdb_pallas(x: jnp.ndarray, w: Dict) -> jnp.ndarray:
    """Fused DRDB forward. x: [B, H, W, C]; w: DRDB param dict."""
    return _drdb_pallas_impl(x, w)


def _fwd(x, w):
    return _drdb_pallas_impl(x, w), (x, w)


def _bwd(res, gout):
    x, w = res
    _, vjp = jax.vjp(drdb_xla, x, w)
    return vjp(gout)


drdb_pallas.defvjp(_fwd, _bwd)


def supports(x_shape, channels: int, growth: int) -> bool:
    """VMEM-fit gate for the fused kernel's tile geometry."""
    if channels != 64 or growth != 32:
        return False
    _, h, wid, c = x_shape
    return h >= TILE_H and wid >= TILE_W


def drdb_grouped_xla(x: jnp.ndarray, w: Dict,
                     edge_mask: jnp.ndarray | None = None,
                     record=None) -> jnp.ndarray:
    """Grouped-weights DRDB in pure XLA: conv-over-concat == sum of
    per-source convs, so each source's contributions to all later convs are
    one WIDE conv (64->160, 32->128, 32->96, 32->64, 32->32). Numerically
    identical to the naive chain, ~1.1x faster on v5e (the narrow 32-out
    convs waste 3/4 of the MXU lanes), and natively differentiable.

    edge_mask (optional, broadcastable against x, e.g. [1, H, 1, 1]):
    zeroes rows outside the true image when x is a halo-extended shard of a
    larger image (spatial parallelism) — reproducing the per-conv zero
    padding the reference applies at the global image boundary. Applied to
    the input and every intermediate activation."""
    c = x.shape[-1]
    g = w["dconv1"]["kernel"].shape[-1]
    ks = [w[f"dconv{i + 1}"]["kernel"] for i in range(5)]
    bs = [w[f"dconv{i + 1}"]["bias"].astype(x.dtype) for i in range(5)]

    if edge_mask is not None:
        m = edge_mask.astype(x.dtype)
        x = x * m

        def relu(t):
            return jax.nn.relu(t) * m
    else:
        relu = jax.nn.relu

    def grp(s):
        lo = c + (s - 1) * g if s > 0 else 0
        hi = lo + (c if s == 0 else g)
        return jnp.concatenate(
            [ks[i][:, :, lo:hi, :] for i in range(s, 5)], -1).astype(x.dtype)

    def dconv(src, k):
        return jax.lax.conv_general_dilated(
            src, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    yx = dconv(x, grp(0))
    r1 = relu(yx[..., 0:g] + bs[0])
    y1 = dconv(r1, grp(1))
    r2 = relu(yx[..., g:2 * g] + y1[..., 0:g] + bs[1])
    y2 = dconv(r2, grp(2))
    r3 = relu(yx[..., 2 * g:3 * g] + y1[..., g:2 * g] + y2[..., 0:g]
                     + bs[2])
    y3 = dconv(r3, grp(3))
    r4 = relu(yx[..., 3 * g:4 * g] + y1[..., 2 * g:3 * g]
                     + y2[..., g:2 * g] + y3[..., 0:g] + bs[3])
    y4 = dconv(r4, grp(4))
    r5 = relu(yx[..., 4 * g:5 * g] + y1[..., 3 * g:4 * g]
                     + y2[..., 2 * g:3 * g] + y3[..., g:2 * g] + y4 + bs[4])
    if record is not None:
        record.append((x, r1, r2, r3, r4, r5))
    feat = jnp.concatenate([x, r1, r2, r3, r4, r5], -1)
    y = jax.lax.conv_general_dilated(
        feat, w["bottleneck"]["kernel"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + jax.nn.relu(y + w["bottleneck"]["bias"].astype(x.dtype))


def phase_split(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 4, H/2, W/2, C] pixel-parity phase planes
    (phase index p = 2*row_parity + col_parity). Formulated as middle-dim
    indexing + stack — measured ~16% faster than reshape/transpose on v5e
    STANDALONE (3.9 vs 4.6 ms at [8,480,640,64] bf16) AND in-context (e7
    round-3: 146.4 vs 155.8 ms fusion core). The reshape/transpose form
    stays A/B-switchable via SEGMIF_AB=phase_split_reshape, read at TRACE time
    (flipping it after jit has no effect; fresh jit per variant)."""
    import os

    b, h, wd, c = x.shape
    hp, wp = h // 2, wd // 2
    z = x.reshape(b, hp, 2, wp, 2, c)
    if ab("phase_split_reshape"):
        return z.transpose(0, 2, 4, 1, 3, 5).reshape(b, 4, hp, wp, c)
    return jnp.stack([z[:, :, i, :, j, :] for i in (0, 1) for j in (0, 1)],
                     1)


def phase_merge(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of phase_split: [B, 4, hp, wp, C] -> [B, 2*hp, 2*wp, C]."""
    b, _, hp, wp, c = xp.shape
    out = xp.reshape(b, 2, 2, hp, wp, c)
    return out.transpose(0, 3, 1, 4, 2, 5).reshape(b, 2 * hp, 2 * wp, c)


def strip_row_mask(b: int, n: int, strip: int, halo: int,
                   hp: int, valid_rows=None) -> jnp.ndarray:
    """In-image row mask [B*4*n, rows, 1, 1] (f32) for phase halo strips:
    0 on rows beyond the true image top/bottom, 1 elsewhere (incl. interior
    halo rows, which hold real neighbour data).

    valid_rows (optional (lo, hi), IMAGE-row coords of the pre-phase-split
    tensor; static ints or traced scalars): restrict validity to image rows
    [lo, hi) — for halo-extended shard blocks of a larger image (spatial
    parallelism), where the block's out-of-image rows are not [0, H). The
    per-phase row parity is accounted for (phase p covers image rows
    2*gl + p//2), so odd bounds are exact."""
    rows = strip + 2 * halo
    ridx = jnp.arange(rows)[None, :] - halo
    gl = ridx + jnp.arange(n)[:, None] * strip                # [n, rows]
    ok = (gl >= 0) & (gl < hp)
    if valid_rows is None:
        m = jnp.broadcast_to(ok[None, None].astype(jnp.float32),
                             (b, 4, n, rows))
    else:
        lo, hi = valid_rows
        parity = jnp.array([0, 0, 1, 1])[:, None, None]       # image-row
        img = 2 * gl[None] + parity                           # [4, n, rows]
        ok4 = ok[None] & (img >= lo) & (img < hi)
        m = jnp.broadcast_to(ok4[None].astype(jnp.float32), (b, 4, n, rows))
    return m.reshape(b * 4 * n, rows, 1, 1)


def _phase_strips(xp: jnp.ndarray, strip: int, halo: int, valid_rows=None):
    """[B, 4, hp, wp, C] -> halo-extended H-strips [B*4*n, strip+2*halo, wp,
    C] plus the in-image row mask [B*4*n, rows, 1, 1] (f32). Row-window
    gathers only — no phase transposes. valid_rows: see strip_row_mask."""
    b, _, hp, wp, c = xp.shape
    n = hp // strip
    rows = strip + 2 * halo
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (halo, halo), (0, 0), (0, 0)))
    xs = jnp.stack(
        [xpad[:, :, i * strip:i * strip + rows] for i in range(n)],
        2)  # [B, 4, n, rows, wp, C]
    xs = xs.reshape(b * 4 * n, rows, wp, c)
    return xs, strip_row_mask(b, n, strip, halo, hp, valid_rows)


def _strips_phase(ys: jnp.ndarray, b: int, strip: int, halo: int):
    """Inverse of _phase_strips (drops halos): [B*4*n, rows, wp, C] ->
    [B, 4, hp, wp, C]."""
    rows = ys.shape[1]
    wp, c = ys.shape[2], ys.shape[3]
    n = ys.shape[0] // (b * 4)
    out = ys[:, halo:halo + strip]
    return out.reshape(b, 4, n * strip, wp, c)


def split_strips(x: jnp.ndarray, strip: int, halo: int):
    """[B, H, W, C] image -> DRDB-ready phase halo strips
    ([B*4*n, rows, wp, C], in-image row mask). The strip-persistent trunk's
    entry transform (models/fusion.py)."""
    return _phase_strips(phase_split(x), strip, halo)


def merge_strips(ys: jnp.ndarray, b: int, strip: int, halo: int):
    """Inverse of split_strips (drops halo rows)."""
    return phase_merge(_strips_phase(ys, b, strip, halo))


def owned_token_weight(b: int, n: int, strip: int, halo: int, wp: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """[1, 4*n*rows*wp] token weight that selects each image pixel exactly
    once from the flattened strip layout [B, (4, n, rows, wp), C]: 1 on a
    strip's owned rows [halo, halo+strip), 0 on halo rows. Used to make the
    FFM's gram reductions exact on strip-layout tokens."""
    rows = strip + 2 * halo
    r = jnp.arange(rows)
    owned = ((r >= halo) & (r < halo + strip)).astype(dtype)      # [rows]
    w = jnp.broadcast_to(owned[None, :, None], (n, rows, wp))
    return jnp.broadcast_to(w[None], (4, n, rows, wp)).reshape(1, -1)


def refresh_strip_halos(xs: jnp.ndarray, b: int, strip: int,
                        halo: int) -> jnp.ndarray:
    """Rebuild the halo rows of every strip from its neighbours' OWNED rows
    (zero beyond the image top/bottom). Cheap: only 2*halo rows per strip
    are rewritten. Needed before a conv consumer whenever the halo rows are
    stale (after a DRDB's 5 convs, or after per-token ops ran on stale
    halos)."""
    rows = xs.shape[1]
    wp, c = xs.shape[2], xs.shape[3]
    n = xs.shape[0] // (b * 4)
    x6 = xs.reshape(b, 4, n, rows, wp, c)
    owned = x6[:, :, :, halo:halo + strip]
    z = jnp.zeros((b, 4, 1, halo, wp, c), xs.dtype)
    top = jnp.concatenate([z, owned[:, :, :n - 1, strip - halo:]], axis=2)
    bot = jnp.concatenate([owned[:, :, 1:, :halo], z], axis=2)
    # Two dynamic-update-slice copies. The hlo_stats self-times made these
    # look like 2.4 + 2.2 ms of avoidable traffic (round-3 addendum 3), but
    # the single-concat form measured SLOWER in-context (e10: 145.4 vs
    # 142.1 ms — the concat materializes the full tensor where the DUS pair
    # fuses into consumers). SEGMIF_AB=halos_concat (trace-time A/B) keeps
    # the concat form for re-measurement.
    if ab("halos_concat"):
        out = jnp.concatenate([top, owned, bot], axis=3)
        return out.reshape(xs.shape)
    x6 = x6.at[:, :, :, :halo].set(top)
    x6 = x6.at[:, :, :, halo + strip:].set(bot)
    return x6.reshape(xs.shape)


def drdb_plane_core(xs: jnp.ndarray, w: Dict, qscales=None,
                    record=None) -> jnp.ndarray:
    """DRDB conv chain on WHOLE phase planes [B*4, hp, wp, C] (no halo
    strips). No re-zeroing mask is needed: the conv's SAME zero padding at
    the plane border IS the reference's image-border zero padding (phase
    planes tile the image by parity). Strips callers must use
    drdb_strips_core, which requires an explicit in-image row mask.

    qscales: [6] calibrated amaxes -> run the int8 chain (kernels/int8.py);
    record: list -> append (x, r1..r5) for calibration."""
    if qscales is not None:
        from .int8 import drdb_chain_int8

        return drdb_chain_int8(xs, w, None, qscales, dil=1)
    return _drdb_chain(xs, w, None, record)


def drdb_strips_core(xs: jnp.ndarray, w: Dict,
                     m: jnp.ndarray, qscales=None,
                     record=None) -> jnp.ndarray:
    """DRDB conv chain on halo strips [B*4*n, rows, wp, C] with in-image row
    mask m (re-zeroes activations outside the TRUE image after each conv,
    reproducing the reference's per-conv zero padding; interior strip halos
    keep real neighbour rows). Returns strips of the same shape; the outer
    `halo` rows lose one row of validity per conv (stale after 5) — callers
    either drop them (_strips_phase) or refresh them (refresh_strip_halos)
    before the next conv consumer. m is REQUIRED: a strips-layout call
    without the image-border re-zeroing mask would silently corrupt border
    numerics (whole-plane inputs go through drdb_plane_core instead)."""
    if m is None:
        raise ValueError(
            "drdb_strips_core requires the in-image row mask; whole-plane "
            "inputs (no halo rows) go through drdb_plane_core")
    if qscales is not None:
        from .int8 import drdb_chain_int8

        return drdb_chain_int8(xs, w, m, qscales, dil=1)
    return _drdb_chain(xs, w, m, record)


def _growth_rs(xs: jnp.ndarray, ks, bs, m, dil: int, record=None):
    """The 5-conv dense-growth chain in the grouped-wide formulation
    (conv-over-concat == sum of per-source wide convs), returning
    (r1..r5). ks/bs: the 5 NAIVE per-conv kernels/biases (raw param dtype;
    cast happens here). m: optional in-image re-zero mask multiplied after
    every relu (strips layout), None for whole planes."""
    g = ks[0].shape[-1]
    c = xs.shape[-1]
    dt = xs.dtype
    bsd = [b.astype(dt) for b in bs]

    if m is None:
        relu = jax.nn.relu
    else:
        md = m.astype(dt)

        def relu(t):
            return jax.nn.relu(t) * md

    def grp(s):
        lo = c + (s - 1) * g if s > 0 else 0
        hi = lo + (c if s == 0 else g)
        return jnp.concatenate(
            [ks[i][:, :, lo:hi, :] for i in range(s, 5)], -1).astype(dt)

    def dconv(src, k):
        return jax.lax.conv_general_dilated(
            src, k, (1, 1), [(dil, dil), (dil, dil)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    yx = dconv(xs, grp(0))
    r1 = relu(yx[..., 0:g] + bsd[0])
    y1 = dconv(r1, grp(1))
    r2 = relu(yx[..., g:2 * g] + y1[..., 0:g] + bsd[1])
    y2 = dconv(r2, grp(2))
    r3 = relu(yx[..., 2 * g:3 * g] + y1[..., g:2 * g] + y2[..., 0:g]
              + bsd[2])
    y3 = dconv(r3, grp(3))
    r4 = relu(yx[..., 3 * g:4 * g] + y1[..., 2 * g:3 * g] + y2[..., g:2 * g]
              + y3[..., 0:g] + bsd[3])
    y4 = dconv(r4, grp(4))
    r5 = relu(yx[..., 4 * g:5 * g] + y1[..., 3 * g:4 * g]
              + y2[..., 2 * g:3 * g] + y3[..., g:2 * g] + y4 + bsd[4])
    if record is not None:
        record.append((xs, r1, r2, r3, r4, r5))
    return r1, r2, r3, r4, r5


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _growth_chain(dil: int, xs, ks, bs, m):
    """Growth chain with a TARGET-GROUPED custom backward.

    XLA's autodiff mechanically transposes the source-grouped forward
    (wide-OUTPUT convs 64->160, 32->128, ...) into narrow-output backward
    convs (160->64, 128->32, ...) — the MXU-lane-wasting shape the grouped
    forward was designed to avoid (e21 round-5 profile: DRDB input-grad
    convs at 14.8-48 TF/s HBM-bound, ~17 ms/DRDB, vs 95-162 forward).

    The dense-growth structure admits the mirror regrouping for the
    backward: pre_t = concat(x, r1..r_{t-1}) (*) L_t with the NAIVE kernel
    L_t, so  d src = sum_t dpre_t (*) flip(L_t^T)  — five convs with
    narrow 32-ch INPUTS and wide 64..192-ch outputs. Weight grads stay on
    XLA's native kernel-grad lowering in the grouped parameterization
    (measured fine: 95-111 TF/s compute bound), reassembled into
    naive-kernel cotangents by pure slicing.

    MEASURED OUTCOME (v5e, bench.py --train A/B, round 5): 11.14 vs 11.48
    pairs/s — the regrouping LOSES ~3%. The input-grad convs are
    HBM-bound, not lane-bound: the target-grouped form reads narrow but
    WRITES wide d-src tensors (3.7 GB of g_t outputs whose lower slices
    wait in HBM for later accumulation) where XLA's narrow-output
    transpose writes 1.1 GB — the byte totals trade within ~10% and XLA's
    schedule wins. Kept as opt-in SEGMIF_AB=drdb_bwd_tg (trace-time) with
    grad parity pinned by
    tests/test_drdb_kernel.py::test_growth_chain_custom_bwd_matches_autodiff."""
    return _growth_rs(xs, ks, bs, m, dil)


def _growth_chain_fwd(dil, xs, ks, bs, m):
    rs = _growth_rs(xs, ks, bs, m, dil)
    return rs, (xs, ks, bs, m, rs)


def _growth_chain_bwd(dil, res, drs):
    xs, ks, bs, m, rs = res
    dt = xs.dtype
    g = ks[0].shape[-1]
    c = xs.shape[-1]
    drs = [d.astype(dt) for d in drs]
    # relu'(pre)*mask == 1[r > 0]: r = relu(pre) * m with m in {0, 1}
    sig = [(r > 0).astype(dt) for r in rs]

    def bwd_in(dy, k):
        # d src of conv(src, k): SAME-geometry conv of dy with the
        # spatially-flipped, in/out-transposed kernel (stride 1, dil d)
        kT = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2).astype(dt)
        return jax.lax.conv_general_dilated(
            dy, kT, (1, 1), [(dil, dil), (dil, dil)],
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dpre5 = drs[4] * sig[4]
    g5 = bwd_in(dpre5, ks[4])                       # [..., c+4g]
    dpre4 = (drs[3] + g5[..., c + 3 * g:c + 4 * g]) * sig[3]
    g4 = bwd_in(dpre4, ks[3])                       # [..., c+3g]
    dpre3 = (drs[2] + g5[..., c + 2 * g:c + 3 * g]
             + g4[..., c + 2 * g:c + 3 * g]) * sig[2]
    g3 = bwd_in(dpre3, ks[2])                       # [..., c+2g]
    dpre2 = (drs[1] + g5[..., c + g:c + 2 * g] + g4[..., c + g:c + 2 * g]
             + g3[..., c + g:c + 2 * g]) * sig[1]
    g2 = bwd_in(dpre2, ks[1])                       # [..., c+g]
    dpre1 = (drs[0] + g5[..., c:c + g] + g4[..., c:c + g]
             + g3[..., c:c + g] + g2[..., c:c + g]) * sig[0]
    g1 = bwd_in(dpre1, ks[0])                       # [..., c]
    dxs = (g1 + g2[..., :c] + g3[..., :c] + g4[..., :c] + g5[..., :c])

    # weight grads via XLA's native kernel-grad conv in the GROUPED
    # parameterization (wide dy operands), reassembled into naive slices
    dpres = [dpre1, dpre2, dpre3, dpre4, dpre5]
    srcs = [xs] + list(rs[:4])
    dkg = []
    for s in range(5):
        dy_s = (dpres[s] if s == 4
                else jnp.concatenate(dpres[s:], axis=-1))
        cin_s = c if s == 0 else g
        zk = jnp.zeros((3, 3, cin_s, (5 - s) * g), ks[0].dtype)
        _, vjp = jax.vjp(
            lambda k, src=srcs[s]: jax.lax.conv_general_dilated(
                src, k.astype(dt), (1, 1), [(dil, dil), (dil, dil)],
                rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC")), zk)
        dkg.append(vjp(dy_s)[0])
    dks = []
    for i in range(5):                      # naive kernel of target i+1
        parts = []
        for s in range(i + 1):              # source blocks x, r1..r_i
            off = (i - s) * g               # target i+1 at position i-s
            parts.append(dkg[s][:, :, :, off:off + g])
        dks.append(jnp.concatenate(parts, axis=2))
    dbs = [jnp.sum(d, axis=(0, 1, 2), dtype=bs[0].dtype) for d in dpres]
    dm = None if m is None else jnp.zeros_like(m)
    return (dxs, tuple(dks), tuple(dbs), dm)


_growth_chain.defvjp(_growth_chain_fwd, _growth_chain_bwd)


def _drdb_chain(xs: jnp.ndarray, w: Dict, m=None,
                record=None) -> jnp.ndarray:
    """Shared dil-1 DRDB conv chain (strips and whole-plane layouts).
    m: optional in-image re-zero mask (strips layout; None = whole planes).
    record (optional list): calibration hook — appends (x, r1..r5), the
    tensors whose abs-maxes become the int8 chain's static scales."""
    ks = tuple(w[f"dconv{i + 1}"]["kernel"] for i in range(5))
    bs = tuple(w[f"dconv{i + 1}"]["bias"] for i in range(5))
    if record is None and ab("drdb_bwd_tg"):
        # opt-in target-grouped custom backward — measured 3% SLOWER than
        # XLA autodiff on v5e (see _growth_chain docstring)
        rs = _growth_chain(1, xs, ks, bs, m)
    else:
        rs = _growth_rs(xs, ks, bs, m, 1, record)
    # The tail (concat -> 1x1 bottleneck -> relu -> residual) dispatches
    # through pallas_drdb_tail.drdb_tail: the XLA concat form by default
    # (measured FASTER than the fused Pallas tail, which pays ~16 ms of
    # producer-layout relayout copies — round-3 addendum 6); the kernel is
    # opt-in via SEGMIF_AB=pallas_tail. Distributing the bottleneck over
    # the sources as 6 small XLA convs was also measured slower on v5e
    # (+8 ms/DRDB: each K=32 conv pays the per-conv floor).
    from .pallas_drdb_tail import drdb_tail

    return drdb_tail(xs, rs, w)


def drdb_phase_core(xp: jnp.ndarray, w: Dict, strip: int,
                    valid_rows=None, qscales=None,
                    record=None) -> jnp.ndarray:
    """DRDB on an already phase-split tensor [B, 4, hp, wp, C] (strip/halo
    handling internal; only cheap row-window gathers touch HBM layout).
    EXACT: same math as drdb_xla on the merged image, incl. the reference's
    per-conv zero padding at the true image border (or, with valid_rows
    (lo, hi), at the given image-row bounds — the spatial-parallel
    halo-extended-block case)."""
    b = xp.shape[0]
    halo = _PHASE_HALO
    xs, m = _phase_strips(xp, strip, halo, valid_rows)
    if valid_rows is not None:
        # a shard block's out-of-image rows hold live data (conv bias
        # ripple from the halo-extended producer) — pre-mask the input like
        # drdb_grouped_xla's edge_mask does (with valid_rows=None the
        # out-of-image rows are _phase_strips' zero padding already)
        xs = xs * m.astype(xs.dtype)
    out = drdb_strips_core(xs, w, m, qscales, record)
    return _strips_phase(out, b, strip, halo)


def drdb_apply_phase(xp: jnp.ndarray, w: Dict, qscales=None,
                     record=None) -> jnp.ndarray:
    """DRDB for phase-layout tensors [B, 4, hp, wp, C] (the persistent
    phase-trunk path in models/fusion.py). Falls back through image space
    when no qualifying strip divides the phase height.

    SEGMIF_AB=drdb_phase_nostrip runs the conv chain on the WHOLE phase
    planes [B*4, hp, wp, C] instead of halo strips — exact (SAME zero pad at
    the plane border == the reference's image-border padding in phase
    space), trades the strip gather/scatter traffic for the slower
    large-plane conv regime. A/B switch, read at TRACE time (flipping it
    after jit has no effect; build a fresh jit per variant). Measured
    SLOWER on v5e: 172.5 vs 146.4 ms fusion core (e7, round-3)."""
    import os

    b, _, hp, wp, c = xp.shape
    if ab("drdb_phase_nostrip"):
        out = drdb_plane_core(xp.reshape(b * 4, hp, wp, c), w, qscales,
                              record)
        return out.reshape(b, 4, hp, wp, c)
    strip = _phase_strip_for(hp, wp)
    if strip is not None:
        return drdb_phase_core(xp, w, strip, None, qscales, record)
    return phase_split(drdb_apply(phase_merge(xp), w, qscales=qscales,
                                  record=record))


def _phase_strip_for(hp: int, wp: int) -> int | None:
    """Pick an H-strip size for the phase formulation: measured v5e fast
    regime needs (strip + 2*halo) * wp <= ~20k px/plane; strip must divide
    the phase height. Prefers the largest qualifying divisor (fewer strips =
    less halo waste). Cap re-validated in-context round-3 (e19 sweep at
    480x640: strip 60 fastest; 48 and 80 both lose). SEGMIF_AB=phase_max_plane
    overrides the cap (trace-time A/B knob)."""
    cap = int(ab("phase_max_plane", "22400"))
    best = None
    for s in range(16, hp + 1):
        if hp % s:
            continue
        if (s + 2 * _PHASE_HALO) * wp <= cap:
            best = s
    return best


_PHASE_HALO = 5  # 5 dil-1 convs after the phase split, reach 1 each


def drdb_phase_xla(x: jnp.ndarray, w: Dict, strip: int) -> jnp.ndarray:
    """EXACT DRDB via parity phase decomposition + H halo strips.

    A dilated(2) conv never mixes 2x2 pixel-parity phases, so the whole
    DRDB chain (dil-2 convs, relu, concat, 1x1 bottleneck, residual) is
    phase-separable: space-to-depth the image into 4 phase planes batched
    along N and run the SAME weights as dilation-1 convs at half resolution.
    The phase planes are then cut into `strip`-row halo strips so each conv
    runs in XLA's fast small-plane regime (~1.7x on v5e at 480x640; see
    OPTIMIZATION.md). Intermediates are re-zeroed outside the true image so
    borders match the reference's per-conv zero padding exactly.
    """
    return phase_merge(drdb_phase_core(phase_split(x), w, strip))


def drdb_apply(x: jnp.ndarray, w: Dict, mode: str = "auto",
               valid_rows=None, qscales=None, record=None) -> jnp.ndarray:
    """mode: 'auto' (phase-strip XLA on TPU when the geometry allows, else
    grouped XLA; pallas if SEGMIF_AB=drdb_pallas on TPU), 'phase', 'grouped',
    'pallas', 'naive'.

    valid_rows (optional (lo, hi), static ints or traced scalars): treat
    only image rows [lo, hi) of x as in-image — out-of-range rows (a spatial
    shard's halo-extended block reaching beyond the global image, or row
    padding) are re-zeroed around every conv, exactly the reference's zero
    padding at the true boundary. Supported by the phase and grouped paths
    (naive/pallas fall through to grouped when set); this is what lets
    parallel/spatial.py route through the SAME dispatcher as the model
    trunk."""
    import os

    if mode == "naive" and valid_rows is None and qscales is None \
            and record is None:
        return drdb_xla(x, w)
    if mode == "pallas" or (mode == "auto"
                            and ab("drdb_pallas")):
        from .attention import _on_tpu

        if (valid_rows is None and qscales is None and record is None
                and _on_tpu()
                and supports(x.shape, x.shape[-1],
                             w["dconv1"]["kernel"].shape[-1])):
            return drdb_pallas(x, w)
    if mode == "phase" or (mode == "auto"
                           and not ab("drdb_no_phase")):
        from .attention import _on_tpu

        b, h, wd, _ = x.shape
        if (mode == "phase" or _on_tpu()) and h % 2 == 0 and wd % 2 == 0:
            strip = _phase_strip_for(h // 2, wd // 2)
            if strip is not None:
                return phase_merge(drdb_phase_core(
                    phase_split(x), w, strip, valid_rows, qscales, record))
    em = None
    if valid_rows is not None:
        lo, hi = valid_rows
        r = jnp.arange(x.shape[1])
        em = ((r >= lo) & (r < hi)).astype(x.dtype)[None, :, None, None]
    if qscales is not None:
        from .int8 import drdb_chain_int8

        return drdb_chain_int8(x, w, em, qscales, dil=2)
    return drdb_grouped_xla(x, w, edge_mask=em, record=record)
