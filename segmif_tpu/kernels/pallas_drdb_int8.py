"""Fused int8 whole-DRDB Pallas kernel, native to the phase-strips layout.

The round-4 attempt pre-registered in OPTIMIZATION.md addendum 2: one
kernel that owns the ENTIRE dense-growth chain (5 convs + bottleneck +
residual) per halo strip, so the only layout boundaries are the strip
tensors the trunk already materializes — the failure mode of every prior
Pallas DRDB attempt was the conv-producer relayout tax at kernel
boundaries (round-3 addendum 6); here the convs have no XLA-side producers
or consumers to disagree with.

Why int8: e20 measured the int8 MXU path at 2.1x bf16 at exactly these
shapes, and the int8 XLA chain (kernels/int8.py) still pays HBM for every
intermediate (r_i int8 + partial-sum f32 round-trips). This kernel keeps
the whole chain VMEM-resident per strip:

 - dx taps stacked into lanes via two sublane-shifted int8 copies
   (src3 = [x(w-1), x(w), x(w+1)] concat on channels);
 - dy taps stacked by leading-dim row shifts (free addressing) into
   src9 = [rows*wp, 9*cin], so each conv is ONE int8 MXU matmul with
   K = 9*cin (576/288/...), accumulating in int32 inside the MXU;
 - growth-conv partial sums accumulate in an f32 [rows*wp, remaining]
   buffer (the "pre" tensor) that never touches HBM;
 - requant epilogues (relu, in-image row mask, int8 clip) feed the next
   conv's source;
 - the bottleneck consumes the int8 sources with the same scale-folded
   int8 weight as the XLA chain, and the residual reads the original bf16
   strip.

Quantization semantics match kernels/int8.py.drdb_chain_int8 exactly
(same scales, same epilogue order), so the interpret-mode parity test
compares against it directly.

Serving-only: taking gradients through the int8 path is a usage error and
raises while the backward pass is traced — the float chain entry in
kernels/int8.py (`_serving_only`) carries a custom_vjp whose bwd raises
(round/clip/int casts would otherwise silently yield zero gradients).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .int8 import _EPS, quantize_kernel


def _grouped_w9_int8(w: Dict, c: int, g: int):
    """Per-source grouped kernels -> ([9*cin_s, n_s] int8, [n_s] f32 col
    scales) for the src9 single-dot form (dy-major, dx, cin ordering —
    matches the kernel's concat order)."""
    ks = [w[f"dconv{i + 1}"]["kernel"] for i in range(5)]
    out = []
    for s in range(5):
        lo = c + (s - 1) * g if s > 0 else 0
        hi = lo + (c if s == 0 else g)
        k = jnp.concatenate([ks[i][:, :, lo:hi, :] for i in range(s, 5)],
                            -1)                       # [3, 3, cin_s, n_s]
        kq, sw = quantize_kernel(k)                   # per-out-channel
        cin_s = k.shape[2]
        n_s = k.shape[3]
        out.append((kq.reshape(9 * cin_s, n_s), sw))
    return out


def _make_kernel(rows: int, wp: int, c: int, g: int, out_dtype):
    npix = rows * wp

    def flat_row_mask(lo, hi):
        idx = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
        r = idx // wp
        return ((r >= lo) & (r < hi)).astype(jnp.float32)

    def src9(x_i8, cin):
        """[rows, wp, cin] int8 -> [rows*wp, 9*cin] int8 (dy-major, dx,
        cin). Leading-dim (rows) shifts are free addressing; the dx shifts
        are slice+zero-pad pairs (an UNALIGNED 322-sublane buffer crashes
        the remote Mosaic compiler — e24b/e24c bisect; slice+pad at the
        aligned wp compiles and is the same bytes moved). Zero fill at the
        w edges IS the reference's conv zero padding in phase space."""
        # each shifted view is built by a concat ALONG THE SHIFT AXIS so
        # its result layout is offset-normalized — mixing sublane-offset
        # views in the lane concat below crashes Mosaic ("result/input
        # offset mismatch on non-concat dimension", e24 bisect)
        zw = jnp.zeros((rows, 1, cin), jnp.int8)
        left = jnp.concatenate([x_i8[:, 1:], zw], axis=1)       # x(w+1)
        right = jnp.concatenate([zw, x_i8[:, :wp - 1]], axis=1)  # x(w-1)
        s3 = jnp.concatenate([right, x_i8, left], axis=-1)
        z = jnp.zeros((1, wp, 3 * cin), jnp.int8)
        up = jnp.concatenate([z, s3[:-1]], axis=0)    # row r holds src[r-1]
        dn = jnp.concatenate([s3[1:], z], axis=0)     # row r holds src[r+1]
        s9 = jnp.concatenate([up, s3, dn], axis=-1)   # [rows, wp, 9cin]
        return s9.reshape(npix, 9 * cin)

    def idot(a_i8, w_ref):
        return jax.lax.dot_general(
            a_i8, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def kernel(lo_ref, hi_ref, xq_ref, xbf_ref, w0, w1, w2, w3, w4, wb,
               sv0, sv1, sv2, sv3, sv4, svb, bias_ref, invs_ref, bb_ref,
               o_ref, r1s, r2s, r3s, r4s, r5s):
        p = pl.program_id(0)
        lo = lo_ref[p]
        hi = hi_ref[p]
        m = flat_row_mask(lo, hi)                      # [npix, 1] f32
        bias = bias_ref[...]                           # [1, 5g] f32
        invs = invs_ref[...]                           # [1, 8] f32

        def requant(pre_act, i, scr):
            """relu + row mask + int8 clip at scale s_i, NORMALIZED through
            a VMEM scratch round-trip: pre_act descends from lane-offset
            slices of the wide `pre` buffer, and Mosaic's lazy offset
            layouts crash any downstream concat mixing offsets ("result/
            input offset mismatch on non-concat dimension" — e24d bisect:
            the shift concats are fine in isolation; the offsets arrive
            with r_i). A full-ref store/load yields the canonical layout.
            Returns the [rows, wp, g] view."""
            t = jax.nn.relu(pre_act) * m
            q = jnp.round(t * invs[:, i:i + 1])
            scr[...] = jnp.clip(q, -127, 127).astype(jnp.int8
                                                     ).reshape(rows, wp, g)
            return scr[...]

        xq = xq_ref[0]                                 # [rows, wp, c] i8
        # conv 1: contributions of x to ALL five pre-activations
        acc = idot(src9(xq, c), w0).astype(jnp.float32) * sv0[...]
        pre = acc + bias                               # [npix, 5g] f32
        r1 = requant(pre[:, 0:g], 1, r1s)
        y = idot(src9(r1, g), w1).astype(jnp.float32) * sv1[...]  # [npix,4g]
        r2 = requant(pre[:, g:2 * g] + y[:, 0:g], 2, r2s)
        pre2 = pre[:, 2 * g:] + y[:, g:]               # [npix, 3g]
        y = idot(src9(r2, g), w2).astype(jnp.float32) * sv2[...]  # [npix,3g]
        r3 = requant(pre2[:, 0:g] + y[:, 0:g], 3, r3s)
        pre3 = pre2[:, g:] + y[:, g:]                  # [npix, 2g]
        y = idot(src9(r3, g), w3).astype(jnp.float32) * sv3[...]  # [npix,2g]
        r4 = requant(pre3[:, 0:g] + y[:, 0:g], 4, r4s)
        pre4 = pre3[:, g:] + y[:, g:]                  # [npix, g]
        y = idot(src9(r4, g), w4).astype(jnp.float32) * sv4[...]  # [npix, g]
        r5 = requant(pre4 + y, 5, r5s)

        # bottleneck: scale-folded int8 1x1 over [xq, r1..r5]
        xc = xq.reshape(npix, c)
        feat = jnp.concatenate(
            [xc] + [r.reshape(npix, g) for r in (r1, r2, r3, r4, r5)],
            axis=-1)
        accb = jax.lax.dot_general(
            feat, wb[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        yb = accb.astype(jnp.float32) * svb[...] + bb_ref[...]
        xf = xbf_ref[0].reshape(npix, c).astype(jnp.float32)
        out = xf + jax.nn.relu(yb)
        o_ref[0] = out.astype(out_dtype).reshape(rows, wp, c)

    return kernel


def drdb_strips_int8_pallas(xs: jnp.ndarray, w: Dict, m: jnp.ndarray,
                            amax: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """int8 whole-DRDB on phase halo strips [S, rows, wp, C].

    xs: bf16/f32 strips; m: in-image row mask [S, rows, 1, 1] (contiguous
    valid-row window per strip — converted to (lo, hi) scalar pairs);
    amax: [6] calibrated abs-maxes (x, r1..r5) as in kernels/int8.py.
    Returns strips of xs.dtype. Quantization semantics identical to
    drdb_chain_int8 (same scales/epilogues); the halo rows of the output
    are stale exactly like the XLA chain's (callers drop or refresh them).
    """
    S, rows, wp, c = xs.shape
    g = w["dconv1"]["kernel"].shape[-1]

    # activation scales
    s_in = [amax[i] / 127.0 + _EPS for i in range(6)]
    sx = s_in[0]
    xq = jnp.clip(jnp.round(xs.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)

    # weights: grouped src9 int8 + per-column f32 scales (sw * s_src)
    grouped = _grouped_w9_int8(w, c, g)
    wqs = [kq for kq, _ in grouped]
    svs = [(sw * s_in[s]).reshape(1, -1).astype(jnp.float32)
           for s, (_, sw) in enumerate(grouped)]
    biases = jnp.concatenate(
        [w[f"dconv{i + 1}"]["bias"] for i in range(5)]).reshape(1, -1
                                                                ).astype(
        jnp.float32)
    invs = jnp.stack([jnp.float32(0)] +
                     [1.0 / s_in[i] for i in range(1, 6)] +
                     [jnp.float32(0), jnp.float32(0)]).reshape(1, 8)

    # bottleneck: per-source act scales folded into the f32 weight slices
    kb = w["bottleneck"]["kernel"].astype(jnp.float32)[0, 0]   # [c+5g, c]
    scale_per_k = jnp.concatenate(
        [jnp.full((c,), s_in[0], jnp.float32)]
        + [jnp.full((g,), s_in[i + 1], jnp.float32) for i in range(5)])
    kbq, swb = quantize_kernel(kb * scale_per_k[:, None])
    svb = swb.reshape(1, -1).astype(jnp.float32)
    bb = w["bottleneck"]["bias"].reshape(1, -1).astype(jnp.float32)

    # mask -> per-strip contiguous (lo, hi) valid-row bounds, passed as
    # WHOLE [S] int32 arrays in SMEM (per-program (1,1) SMEM blocks violate
    # the Pallas block-divisibility rule; indexing by program_id inside
    # the kernel is the supported pattern)
    mrows = (m.reshape(S, rows) > 0)
    lo = jnp.argmax(mrows, axis=1).astype(jnp.int32)
    hi = (rows - jnp.argmax(mrows[:, ::-1], axis=1)).astype(jnp.int32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    rep2 = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole-array weights

    out = pl.pallas_call(
        _make_kernel(rows, wp, c, g, xs.dtype),
        grid=(S,),
        in_specs=[smem, smem,
                  pl.BlockSpec((1, rows, wp, c), lambda p: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, rows, wp, c), lambda p: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [rep2] * 6 + [rep2] * 6 + [rep2] * 3,
        out_specs=pl.BlockSpec((1, rows, wp, c), lambda p: (p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, rows, wp, c), xs.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((rows, wp, g), jnp.int8)
                        for _ in range(5)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * S * rows * wp * (c * 5 * g + g * g * 10)
            + 2 * S * rows * wp * (c + 5 * g) * c,
            bytes_accessed=xs.size * 3 + xs.size * 2,
            transcendentals=0),
        interpret=interpret,
    )(lo, hi, xq, xs.astype(xs.dtype), *wqs, kbq, *svs, svb, biases, invs,
      bb)
    return out
