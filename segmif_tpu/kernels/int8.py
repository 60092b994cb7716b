"""int8 post-training quantization for the DRDB conv chain.

The DRDB growth convs are the pipeline's dominant FLOPs (453 of ~770
GFLOP/pair, OPTIMIZATION.md round-2 addendum 2) and run compute-bound on
the MXU at ~162 TF/s in bf16. The v5e MXU's int8 path is 2x that rate, and
measured at the real phase-strip shape it DELIVERS 2.05x
(experiments/e20_int8_drdb.py part 1: [128,70,320,64]->160 conv, bf16
4.92 ms vs int8 2.35-2.43 ms for every epilogue form — the round-2 e1
"int8 is not faster" reading does not reproduce on the current stack and
is superseded).

Scheme (standard PTQ, chosen so the whole chain keeps XLA-fusable
single-pass epilogues):
 - weights: per-OUTPUT-CHANNEL symmetric int8 (computed from the f32
   weights at trace time; folding happens in-graph so converted reference
   checkpoints quantize on the fly);
 - activations: per-tensor symmetric int8 with STATIC calibrated scales
   (amax recorded by one forward pass in calibrate mode — dynamic scales
   would force a full extra f32 materialization of every pre-activation
   for the max-reduce, defeating the traffic win);
 - growth conv s: acc_i32 = conv(r_q, w_q); real = acc * (s_in * sw_col);
   requant r_{s+1} = clip(round(preact / s_{s+1})) fused into the epilogue;
 - bottleneck: the per-source input scales FOLD into the f32 bottleneck
   weight slices before quantization (conv is linear in the input), so the
   int8 concat feeds ONE int8 1x1 conv exactly;
 - residual add + final relu in f32 against the original bf16 input.

Matches the math of /root/reference/core/model_fusion.py:117-157 up to
quantization error; the error is MEASURED, not assumed: accuracy.py
--drift_int8 records fused-Y SSIM / argmax agreement vs f32 on converted
reference weights, and tests/test_int8.py pins the formulation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12


@jax.custom_vjp
def _serving_only(t: jnp.ndarray) -> jnp.ndarray:
    """Float identity whose backward pass RAISES.

    The int8 chain's quantize casts have float0 cotangents, so JAX prunes
    the backward through them entirely — differentiating a quant='int8'
    model would silently produce zero gradients through the DRDBs (only the
    f32 residual add would carry grad). A custom_vjp on the int8-dtype
    quantizer never even gets called; the guard must sit on the FLOAT chain
    input, which every upstream parameter's gradient has to cross. The bwd
    body executes while the backward pass is traced, so jax.grad raises
    immediately."""
    return t


def _so_fwd(t):
    return t, None


def _so_bwd(res, g):
    raise NotImplementedError(
        "the int8 DRDB path is serving-only: gradients through the "
        "quantize/requant rounds are identically zero. Train with "
        "quant='none' (the default) and quantize the trained weights via "
        "serving.quantize_for_serving.")


_serving_only.defvjp(_so_fwd, _so_bwd)


def quantize_kernel(k: jnp.ndarray):
    """Per-output-channel symmetric int8 for an HWIO conv kernel.
    Returns (k_q int8, scale [cout] f32)."""
    kf = k.astype(jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1))) / 127.0 + _EPS
    kq = jnp.round(kf / sw).astype(jnp.int8)
    return kq, sw


def quantize_act(t: jnp.ndarray, amax) -> jnp.ndarray:
    """Symmetric per-tensor int8 with a static scale s = amax/127."""
    s = jnp.asarray(amax, jnp.float32) / 127.0 + _EPS
    return jnp.clip(jnp.round(t.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)


def record_amax(tensors) -> jnp.ndarray:
    """[len(tensors)] per-tensor abs-max — the calibration record."""
    return jnp.stack([jnp.max(jnp.abs(t.astype(jnp.float32)))
                      for t in tensors])


def drdb_chain_int8(xs: jnp.ndarray, w: Dict, m: Optional[jnp.ndarray],
                    amax: jnp.ndarray, dil: int = 1) -> jnp.ndarray:
    """int8 DRDB conv chain, layout-polymorphic like the bf16 _drdb_chain:
    dil=1 for phase strips / whole phase planes (padding 1), dil=2 for
    image space (the reference's dilated form, padding 2). `m` is the
    in-image re-zeroing mask (required for halo strips, optional edge mask
    for image space, None for whole planes). `amax`: [6] calibrated
    abs-maxes of (x, r1..r5). Input/output dtype preserved (bf16/f32);
    everything between the entry quantize and the residual is int8/int32/f32
    epilogue math."""
    g = w["dconv1"]["kernel"].shape[-1]
    c = xs.shape[-1]
    out_dtype = xs.dtype
    xs = _serving_only(xs)  # raises under jax.grad (serving-only path)
    if dil == 1 and m is not None and xs.ndim == 4:
        from ..utils.ab import ab

        if ab("drdb_int8_pallas"):
            from .attention import _on_tpu
            from .pallas_drdb_int8 import drdb_strips_int8_pallas

            if _on_tpu():
                return drdb_strips_int8_pallas(xs, w, m, amax)
    ks = [w[f"dconv{i + 1}"]["kernel"] for i in range(5)]
    bs = [w[f"dconv{i + 1}"]["bias"].astype(jnp.float32) for i in range(5)]
    mf = None if m is None else m.astype(jnp.float32)

    def grp(s):
        lo = c + (s - 1) * g if s > 0 else 0
        hi = lo + (c if s == 0 else g)
        return jnp.concatenate(
            [ks[i][:, :, lo:hi, :] for i in range(s, 5)], -1)

    def iconv(src_q, kq):
        pad = [(dil, dil), (dil, dil)]
        return jax.lax.conv_general_dilated(
            src_q, kq, (1, 1), pad, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    s_in = [amax[i] / 127.0 + _EPS for i in range(6)]  # x, r1..r5

    def relu_q(t, idx):
        """relu + in-image re-zero + requant to int8 at scale s_in[idx]."""
        t = jax.nn.relu(t.astype(jnp.float32))
        if mf is not None:
            t = t * mf
        return jnp.clip(jnp.round(t / s_in[idx]), -127, 127
                        ).astype(jnp.int8)

    xq = quantize_act(xs, amax[0])
    qk = []
    sw = []
    for s in range(5):
        kq_, sw_ = quantize_kernel(grp(s))
        qk.append(kq_)
        sw.append(sw_)

    def deq(acc, s, src_idx):
        # partial sums are stored at BF16 width: the f32 form doubled the
        # chain's intermediate HBM traffic and measured SLOWER in-context
        # than the bf16 chain despite 2.1x convs (e22 first cut,
        # OPTIMIZATION.md round-4); bf16 partials restore traffic parity.
        # The requant epilogues upcast to f32 locally (XLA fuses).
        return (acc.astype(jnp.float32)
                * (sw[s] * s_in[src_idx])).astype(jnp.bfloat16)

    yx = deq(iconv(xq, qk[0]), 0, 0)                       # [*, 5g] f32
    r1 = relu_q(yx[..., 0:g] + bs[0], 1)
    y1 = deq(iconv(r1, qk[1]), 1, 1)                       # [*, 4g]
    r2 = relu_q(yx[..., g:2 * g] + y1[..., 0:g] + bs[1], 2)
    y2 = deq(iconv(r2, qk[2]), 2, 2)                       # [*, 3g]
    r3 = relu_q(yx[..., 2 * g:3 * g] + y1[..., g:2 * g] + y2[..., 0:g]
                + bs[2], 3)
    y3 = deq(iconv(r3, qk[3]), 3, 3)                       # [*, 2g]
    r4 = relu_q(yx[..., 3 * g:4 * g] + y1[..., 2 * g:3 * g]
                + y2[..., g:2 * g] + y3[..., 0:g] + bs[3], 4)
    y4 = deq(iconv(r4, qk[4]), 4, 4)                       # [*, g]
    r5 = relu_q(yx[..., 4 * g:5 * g] + y1[..., 3 * g:4 * g]
                + y2[..., 2 * g:3 * g] + y3[..., g:2 * g] + y4 + bs[4], 5)

    # bottleneck: fold each source's static act scale into its K-slice of
    # the f32 weight (conv is linear in the input), THEN quantize — the
    # int8 concat feeds one exact int8 1x1 conv
    kb = w["bottleneck"]["kernel"].astype(jnp.float32)     # [1,1,c+5g,c]
    scale_per_k = jnp.concatenate(
        [jnp.full((c,), s_in[0], jnp.float32)]
        + [jnp.full((g,), s_in[i + 1], jnp.float32) for i in range(5)])
    kb_scaled = kb * scale_per_k[None, None, :, None]
    kbq, swb = quantize_kernel(kb_scaled)
    feat_q = jnp.concatenate([xq, r1, r2, r3, r4, r5], -1)
    accb = jax.lax.conv_general_dilated(
        feat_q, kbq, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = accb.astype(jnp.float32) * swb \
        + w["bottleneck"]["bias"].astype(jnp.float32)
    out = xs.astype(jnp.float32) + jax.nn.relu(y)
    return out.astype(out_dtype)
