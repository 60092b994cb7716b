"""Fused Pallas TPU kernel for the DRDB *tail*: concat -> 1x1 bottleneck ->
bias -> relu -> residual, with NO concat materialization.

MEASURED OUTCOME: OPT-IN, NOT THE DEFAULT (see drdb_tail below) — the
kernel is bit-exact and its own streaming is near-floor, but XLA surrounds
it with ~16 ms of operand relayout copies because the conv producers emit
batch-minor layouts a matmul kernel cannot view for free. Kept as the
worked negative result + re-measurement hook (SEGMIF_AB=pallas_tail);
OPTIMIZATION.md round-3 addendum 6 has the full layout analysis.

Motivating profile (round-3 e12/e13, v5e, b8 480x640 bf16): the XLA tail
of each DRDB costs ~8 ms — the [128, 70, 320, 224] concat buffer is built
as a chain of full-buffer dynamic-update-slice fusions (~1.1-1.65 ms each,
the anonymous `constant_dynamic-update-slice_fusion.N` ops = 'other/glue'
22 ms in the e12 profile), then the 1x1 bottleneck conv re-reads the
224-channel buffer (1.6 ms) and the residual add re-reads xs (1.37 ms).

The kernel reads xs and r1..r5 tile-by-tile ONCE, computes
  out = xs + relu(xs @ Wb[0:64] + sum_i r_i @ Wb[64+32i : 96+32i] + bb)
with a float32 accumulator in VMEM, and writes out — the 224-channel
concat never exists. The 5 dilated growth convs STAY in XLA (they run at
162 TF/s there; a fully fused DRDB loses on MXU pass-padding, round-3
addendum 5). Backward recomputes through the XLA tail expression under
jax.custom_vjp.

Reference semantics: core/model_fusion.py:117-157 (DRDB.forward's
`torch.cat` + `conv_post` + residual).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..utils.ab import ab
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes (flattened spatial*batch positions) per grid step
_TM = 4096


def _tail_kernel(xs, r1, r2, r3, r4, r5, wbt, bb, out, *, g: int):
    """Channel-major tiles: xs/out [C, TM], r_i [G, TM], wbt [C, C+5G]
    (bottleneck TRANSPOSED), bb [C, 1]. acc[c_out, m] = sum_k wbt[c_out, k]
    * feat[k, m] — the 224-channel feat never exists."""
    c = xs.shape[0]
    wv = wbt[...]

    def dot(w_part, t):
        return jax.lax.dot_general(w_part, t[...], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    acc = dot(wv[:, :c], xs)
    for i, r in enumerate((r1, r2, r3, r4, r5)):
        acc += dot(wv[:, c + i * g:c + (i + 1) * g], r)
    # round the f32 accumulator at the conv-output boundary like the XLA
    # chain does (conv -> bf16, then bias+relu+residual in bf16): keeps the
    # kernel allclose to the image-space pipeline at bf16 tolerances
    y = acc.astype(out.dtype) + bb[...]
    out[...] = xs[...] + jax.nn.relu(y)


def _tail_impl(xs: jnp.ndarray, rs: Sequence[jnp.ndarray], wb: jnp.ndarray,
               bb: jnp.ndarray) -> jnp.ndarray:
    """xs: [S, R, W, C]; rs: five [S, R, W, G]; wb: [C+5G, C]; bb: [C].

    LAYOUT IS THE POINT: the XLA convs producing xs/r_i emit batch-minor
    {0,3,2,1} layouts (round-3 e13 HLO dump). A pallas_call on the
    [S, R, W, C] shapes constrains its operands to the standard layout, so
    XLA inserts six full-tensor relayout copies and lane-pads the 32/64
    channel tiles 4x/2x in VMEM (measured: scoped-vmem OOM at 22.8 MB) —
    the same failure mode that sank the round-1 kernels (OPTIMIZATION.md
    round-1 addendum 7). Instead the kernel consumes transpose VIEWS
    [C, W, R, S] -> [C, M] whose standard layout is the SAME BYTES as the
    producers' {0,3,2,1}: the transposes are layout bitcasts, the
    128-batch*spatial positions land on the lane dim (fully used), and
    channels land on sublanes where the contraction wants them."""
    s, rows, w_, c = xs.shape
    g = rs[0].shape[-1]
    m = s * rows * w_
    if m % _TM:
        raise ValueError(
            f"drdb_tail_pallas needs S*R*W % {_TM} == 0 (got {m}); the "
            "drdb_tail dispatcher routes such shapes to the XLA tail")
    dt = xs.dtype

    def cm(t):  # channel-major flat view [C, M]
        return jnp.transpose(t, (3, 2, 1, 0)).reshape(t.shape[-1], m)

    def tspec(ch):
        return pl.BlockSpec((ch, _TM), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * m * (c + 5 * g) * c
    bytes_ = (xs.size * 2 + sum(r.size for r in rs)) * dt.itemsize
    out = pl.pallas_call(
        functools.partial(_tail_kernel, g=g),
        grid=(m // _TM,),
        in_specs=[tspec(c)] + [tspec(g)] * 5 + [wspec, wspec],
        out_specs=tspec(c),
        out_shape=jax.ShapeDtypeStruct((c, m), dt),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_,
                                      transcendentals=0),
    )(cm(xs), *(cm(r) for r in rs), wb.T.astype(dt),
      bb.reshape(-1, 1).astype(dt))
    return jnp.transpose(out.reshape(c, w_, rows, s), (3, 2, 1, 0))


def _tail_xla(xs, rs, wb, bb):
    """Ground truth (identical math to _drdb_chain's concat tail: conv
    output rounded to the working dtype, then bias+relu+residual) and the
    backward-recompute expression."""
    dt = xs.dtype
    feat = jnp.concatenate([xs, *rs], -1)
    y = jax.lax.dot_general(feat, wb.astype(dt), (((3,), (0,)), ((), ())))
    return xs + jax.nn.relu(y + bb.astype(dt))


@jax.custom_vjp
def drdb_tail_pallas(xs, r1, r2, r3, r4, r5, wb, bb):
    """Fused DRDB tail. xs: [S, R, W, C]; r_i: [S, R, W, G];
    wb: [C+5G, C] (the 1x1 bottleneck kernel[0, 0]); bb: [C]."""
    return _tail_impl(xs, (r1, r2, r3, r4, r5), wb, bb)


def _fwd(xs, r1, r2, r3, r4, r5, wb, bb):
    return _tail_impl(xs, (r1, r2, r3, r4, r5), wb, bb), (
        xs, (r1, r2, r3, r4, r5), wb, bb)


def _bwd(res, gout):
    xs, rs, wb, bb = res
    _, vjp = jax.vjp(lambda x, a, b, c, d, e, w, bias: _tail_xla(
        x, (a, b, c, d, e), w, bias), xs, *rs, wb, bb)
    return vjp(gout.astype(xs.dtype))


drdb_tail_pallas.defvjp(_fwd, _bwd)


def drdb_tail(xs, rs: Sequence[jnp.ndarray], w: dict) -> jnp.ndarray:
    """Dispatcher. DEFAULT IS THE XLA CONCAT TAIL — measured on v5e (one
    DRDB at [8,480,640,64] bf16, phase-strips form, in-graph scan): XLA
    29.49 ms vs Pallas tail 45.75 ms (bit-exact, maxdiff 0.0). The kernel's
    own streaming is ~2.5 ms; the loss is ~16 ms of relayout copies XLA
    inserts around the custom call: the conv producers emit batch-MINOR
    {0,3,2,1} layouts ([R][W][C][S] bytes, S=batch*strips minor), which a
    conv consumer reads natively but a matmul kernel cannot — the
    contraction dim C is neither lanes nor flat-mergeable with them, so
    there is NO free bitcast view and every operand pays a transpose.
    (The first attempt, standard-layout [S,R,W,C] blocks, additionally
    lane-padded the 32/64-channel tiles 4x/2x and OOM'd scoped VMEM at
    22.8 MB.) Opt-in via SEGMIF_AB=pallas_tail (trace-time; flipping after
    jit has no effect) for re-measurement on future toolchains; see
    OPTIMIZATION.md round-3 addendum 6."""
    import os

    from .attention import _on_tpu

    wb = w["bottleneck"]["kernel"][0, 0]
    bb = w["bottleneck"]["bias"]
    if (_on_tpu() and xs.ndim == 4
            and (xs.shape[0] * xs.shape[1] * xs.shape[2]) % _TM == 0
            and ab("pallas_tail")):
        return drdb_tail_pallas(xs, *rs, wb, bb)
    return _tail_xla(xs, tuple(rs), wb, bb)
