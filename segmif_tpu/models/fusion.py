"""Fusion network: dilated residual dense blocks + hierarchical interactive
attention, in Flax (NHWC).

Re-design of /root/reference/core/model_fusion.py:

 - DRDB (dilated residual dense block), :117-157.
 - Linear cross-attention pair CrossAttention (queries = fusion branches,
   KV = seg feature — "MoAM") / CrossAttention2 (query = seg feature,
   KV = fusion branches — "SoAM"), :250-328. Both use the O(N) "context
   vector" form, implemented by kernels.attention.linear_cross_attention.
 - CrossPath (:329-361) and FeatureFusionModule (:430-463): gated projections,
   both attentions, concat, residual + LayerNorm. Ablation variants
   (_SoAM :467-501 / _MoAM :503-536) are the `interaction` switch here rather
   than copy-pasted classes.
 - FusionNetwork: the deployed `Fusion_Network3_ac` (:1026-1067) — per-branch
   conv->PReLU->DRDB, two interactive rounds against seg taps out1 (64ch,
   proj conv3) and out2 (128ch, proj conv4), DRDB between rounds, concat +
   3 convs down to the fused Y channel. The reference's quirks are preserved
   where they affect behavior: the FFM is weight-SHARED across both rounds
   (reference constructs ffm2 but never calls it, :1039-1040,1058,1061), and
   a single scalar PReLU parameter is shared across every activation site
   (reference reuses one nn.PReLU()). `interaction` also covers the concat /
   add / none ablations (_Con :662-711, _Add :714-757, Fusion_Network_rmseg
   :934-1025).
 - SimpleFusionNetwork: the legacy 2-input Fusion_Network (:158-182).

NHWC throughout; tokens are [B, N, C] where N = H*W in row-major order,
matching the reference's flatten(2).transpose(1, 2).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.attention import (
    linear_cross_attention_flat,
    linear_ctx_blockdiag,
)
from ..ops.color import minmax_stretch
from ..utils.ab import ab

_DENSE_INIT = nn.initializers.truncated_normal(stddev=0.02)
_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _use_phase_trunk(h: int, w: int) -> bool:
    """Gate for the phase-persistent fusion trunk: the DRDBs' expensive
    phase transposes are hoisted to ONE split per trunk input and ONE merge
    before the tail (the FFM rounds and 1x1 projections are token-order-
    invariant, so they run directly on phase planes). TPU-only by default
    (where the phase/strip conv regime wins; see OPTIMIZATION.md);
    SEGMIF_FORCE_PHASE_TRUNK=1 forces it on for CPU parity tests,
    SEGMIF_NO_PHASE_TRUNK=1 disables."""
    import os

    if os.environ.get("SEGMIF_NO_PHASE_TRUNK") or h % 2 or w % 2:
        return False
    from ..kernels.pallas_drdb import _phase_strip_for

    if _phase_strip_for(h // 2, w // 2) is None:
        return False
    if os.environ.get("SEGMIF_FORCE_PHASE_TRUNK"):
        return True
    from ..kernels.attention import _on_tpu

    return _on_tpu()


def _use_strips() -> bool:
    """Gate for the tail strip-conv path: TPU only (the fast small-plane
    regime is a TPU conv-lowering property), opt-out via SEGMIF_NO_STRIPS,
    opt-in off-TPU via SEGMIF_FORCE_STRIPS (CPU parity tests)."""
    import os

    if os.environ.get("SEGMIF_NO_STRIPS"):
        return False
    if os.environ.get("SEGMIF_FORCE_STRIPS"):
        return True
    from ..kernels.attention import _on_tpu

    return _on_tpu()


def _prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class _ConvWeights(nn.Module):
    """Raw conv kernel+bias params (keeps the {name: {kernel, bias}} tree of
    nn.Conv while letting the DRDB compute path choose its formulation)."""
    cin: int
    cout: int
    ksize: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", _CONV_INIT,
                          (self.ksize, self.ksize, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros, (self.cout,))
        return kern, bias


class DRDB(nn.Module):
    """Dilated residual dense block: 5 dilated(2) 3x3 convs with dense concat
    growth, 1x1 bottleneck, residual add (model_fusion.py:117-157).

    The compute path is kernels.pallas_drdb.drdb_apply: grouped-wide-conv
    XLA by default (identical math, better MXU lane utilization than the
    naive narrow-output chain), optional fused Pallas kernel."""
    channels: int = 64
    growth_rate: int = 32
    dtype: jnp.dtype = jnp.float32
    mode: str = "auto"
    quant: str = "none"  # "none" | "calibrate" (record act amaxes into the
                         # 'quant' collection, f32/bf16 math) | "int8"
                         # (kernels/int8.py chain with the recorded scales)

    @nn.compact
    def __call__(self, x: jnp.ndarray, layout: str = "image",
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """layout: 'image' [B,H,W,C] | 'phase' [B,4,hp,wp,C] |
        'strips' [B*4*n, rows, wp, C] (with `mask` = in-image row mask,
        fresh halos expected; see kernels.pallas_drdb.drdb_strips_core)."""
        from ..kernels.pallas_drdb import (drdb_apply, drdb_apply_phase,
                                           drdb_strips_core)

        w = {}
        cin = self.channels
        for i in range(5):
            k, b = _ConvWeights(cin, self.growth_rate, 3,
                                name=f"dconv{i + 1}")()
            w[f"dconv{i + 1}"] = {"kernel": k, "bias": b}
            cin += self.growth_rate
        k, b = _ConvWeights(cin, self.channels, 1, name="bottleneck")()
        w["bottleneck"] = {"kernel": k, "bias": b}
        qvar = qscales = record = None
        if self.quant != "none":
            qvar = self.variable("quant", "amax",
                                 lambda: jnp.zeros((6,), jnp.float32))
            if self.quant == "int8":
                qscales = qvar.value
            elif self.quant == "calibrate":
                record = []
            else:
                raise ValueError(f"unknown quant mode {self.quant!r}")
        if self.is_initializing():
            qscales = record = None
        x = x.astype(self.dtype)
        if layout == "strips":
            out = drdb_strips_core(x, w, mask, qscales, record)
        elif layout == "phase":
            out = drdb_apply_phase(x, w, qscales, record)
        else:
            out = drdb_apply(x, w, self.mode, qscales=qscales, record=record)
        if record:
            from ..kernels.int8 import record_amax

            qvar.value = jnp.maximum(qvar.value, record_amax(record[0]))
        return out


class CrossAttentionSeg2Branches(nn.Module):
    """KV from the seg feature, queries from both fusion branches
    (reference CrossAttention, model_fusion.py:250-288)."""
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    return_context: bool = False  # expose the [B,H,D,D] attention context
                                  # (reference *_showAttention variants)

    @nn.compact
    def __call__(self, x1, x2, seg):
        c = x1.shape[-1]
        h = self.num_heads
        scale = (c // h)**-0.5
        kv = nn.Dense(2 * c, use_bias=False, kernel_init=_DENSE_INIT,
                      dtype=self.dtype, name="kv_seg")(seg)
        if self.return_context:
            o1, ctx = linear_cross_attention_flat(
                x1, kv[..., :c], kv[..., c:], scale, h, return_ctx=True)
            o2 = linear_cross_attention_flat(x2, kv[..., :c], kv[..., c:],
                                             scale, h)
            return o1, o2, ctx
        # one block-diagonal context, applied to both branch queries
        bd = linear_ctx_blockdiag(kv[..., :c], kv[..., c:], scale,
                                  h).astype(x1.dtype)
        o1 = jnp.einsum("bnc,bcd->bnd", x1, bd)
        o2 = jnp.einsum("bnc,bcd->bnd", x2, bd)
        return o1, o2


class CrossAttentionBranches2Seg(nn.Module):
    """KV from each fusion branch, query from the seg feature
    (reference CrossAttention2, model_fusion.py:290-328)."""
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, seg):
        c = x1.shape[-1]
        h = self.num_heads
        scale = (c // h)**-0.5
        outs = []
        for name, x in (("kv1", x1), ("kv2", x2)):
            kv = nn.Dense(2 * c, use_bias=False, kernel_init=_DENSE_INIT,
                          dtype=self.dtype, name=name)(x)
            outs.append(linear_cross_attention_flat(
                seg, kv[..., :c], kv[..., c:], scale, h))
        return outs[0], outs[1]


class _DenseKernel(nn.Module):
    """Raw Dense kernel param (same tree path/init as nn.Dense(use_bias=False),
    for compute paths that fold the projection algebraically)."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _DENSE_INIT, (self.cin, self.cout))


class _SegKVWeights(nn.Module):
    """Param tree of CrossAttentionSeg2Branches (kv_seg kernel only)."""
    dim: int

    @nn.compact
    def __call__(self):
        return _DenseKernel(self.dim, 2 * self.dim, name="kv_seg")()


class _BranchKVWeights(nn.Module):
    """Param tree of CrossAttentionBranches2Seg (kv1/kv2 kernels)."""
    dim: int

    @nn.compact
    def __call__(self):
        return (_DenseKernel(self.dim, 2 * self.dim, name="kv1")(),
                _DenseKernel(self.dim, 2 * self.dim, name="kv2")())


class _DenseWeights(nn.Module):
    """Raw Dense kernel+bias params (same tree path/init as nn.Dense)."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _DENSE_INIT, (self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


class _LayerNormWeights(nn.Module):
    """Raw LayerNorm scale+bias params (same tree path as nn.LayerNorm)."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class CrossPath(nn.Module):
    """Gated dual cross-attention exchange (model_fusion.py:329-361).

    interaction: 'both' (deployed), 'moam' (seg->branches only, CrossPath_M),
    'soam' (branches->seg only, CrossPath_S).

    The deployed 'both' path is computed in a fully FOLDED form (same math,
    same param tree as the modular path): the KV projections collapse into
    the tiny per-head contexts via gram matrices (K^T V = Wk^T (X^T X) Wv),
    and the end projections fold into the [C, C] context matrices, so per
    round only the three channel_proj matmuls, three gram matmuls, and four
    [N, C] x [C, C] context applications touch the N = H*W token dimension.
    """
    dim: int
    num_heads: int = 8
    interaction: str = "both"
    dtype: jnp.dtype = jnp.float32
    return_context: bool = False

    @nn.compact
    def __call__(self, x1, x2, seg, token_weight=None, gram_slice=None):
        dim = self.dim
        if self.interaction == "both" and not self.return_context:
            # folded compute path (kernels/pallas_ffm.py): gather the raw
            # weights (identical param tree to the modular path below) and
            # dispatch to the fused Pallas kernel on TPU / folded XLA
            # elsewhere
            from ..kernels.pallas_ffm import crosspath_apply

            scale = (dim // self.num_heads)**-0.5
            w = {}
            for i, name in ((1, "channel_proj1"), (2, "channel_proj2"),
                            (3, "channel_proj3")):
                k, b = _DenseWeights(dim, 2 * dim, name=name)()
                w[f"wp{i}"], w[f"bp{i}"] = k, b
            w["wkv3"] = _SegKVWeights(dim, name="cross_attn")()
            w["wkv1"], w["wkv2"] = _BranchKVWeights(dim, name="cross_attn2")()
            w["we1"], w["be1"] = _DenseWeights(2 * dim, dim,
                                               name="end_proj1")()
            w["we2"], w["be2"] = _DenseWeights(2 * dim, dim,
                                               name="end_proj2")()
            w["ln1_scale"], w["ln1_bias"] = _LayerNormWeights(dim,
                                                              name="norm1")()
            w["ln2_scale"], w["ln2_bias"] = _LayerNormWeights(dim,
                                                              name="norm2")()
            return crosspath_apply(x1.astype(self.dtype),
                                   x2.astype(self.dtype),
                                   seg.astype(self.dtype), w, scale,
                                   self.num_heads, token_weight, gram_slice)
        if token_weight is not None or gram_slice is not None:
            raise NotImplementedError(
                "token_weight/gram_slice require the folded 'both' path")
        y1, u1 = jnp.split(nn.relu(nn.Dense(dim * 2, kernel_init=_DENSE_INIT,
                                            dtype=self.dtype,
                                            name="channel_proj1")(x1)), 2, -1)
        y2, u2 = jnp.split(nn.relu(nn.Dense(dim * 2, kernel_init=_DENSE_INIT,
                                            dtype=self.dtype,
                                            name="channel_proj2")(x2)), 2, -1)
        y3, u3 = jnp.split(nn.relu(nn.Dense(dim * 2, kernel_init=_DENSE_INIT,
                                            dtype=self.dtype,
                                            name="channel_proj3")(seg)), 2, -1)
        ctx = None
        if self.interaction == "both":
            if self.return_context:
                v1, v2, ctx = CrossAttentionSeg2Branches(
                    dim, self.num_heads, self.dtype, return_context=True,
                    name="cross_attn")(u1, u2, u3)
            else:
                v1, v2 = CrossAttentionSeg2Branches(
                    dim, self.num_heads, self.dtype,
                    name="cross_attn")(u1, u2, u3)
            z1, z2 = CrossAttentionBranches2Seg(dim, self.num_heads, self.dtype,
                                                name="cross_attn2")(y1, y2, y3)
            m1 = jnp.concatenate([z1, v1], axis=-1)
            m2 = jnp.concatenate([z2, v2], axis=-1)
        elif self.interaction == "moam":
            m1, m2 = CrossAttentionSeg2Branches(dim, self.num_heads, self.dtype,
                                                name="cross_attn")(u1, u2, u3)
        elif self.interaction == "soam":
            m1, m2 = CrossAttentionBranches2Seg(dim, self.num_heads, self.dtype,
                                                name="cross_attn2")(y1, y2, y3)
        else:
            raise ValueError(f"unknown interaction {self.interaction!r}")
        o1 = nn.Dense(dim, kernel_init=_DENSE_INIT, dtype=self.dtype,
                      name="end_proj1")(m1)
        o2 = nn.Dense(dim, kernel_init=_DENSE_INIT, dtype=self.dtype,
                      name="end_proj2")(m2)
        o1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x1 + o1)
        o2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x2 + o2)
        if self.return_context:
            return o1, o2, ctx
        return o1, o2


class FeatureFusionModule(nn.Module):
    """NCHW<->token plumbing around CrossPath in the reference
    (model_fusion.py:430-463); here just reshape NHWC<->[B,N,C]."""
    dim: int
    num_heads: int = 8
    interaction: str = "both"
    dtype: jnp.dtype = jnp.float32
    return_context: bool = False

    @nn.compact
    def __call__(self, x1, x2, seg, token_weight=None, gram_slice=None):
        import os

        cross = CrossPath(self.dim, self.num_heads, self.interaction,
                          self.dtype, self.return_context, name="cross")
        # The deployed folded path is RANK-POLYMORPHIC (every op touches only
        # the channel dim), so phase/strip layouts pass through UNRESHAPED:
        # materializing a [B, N, C] token tensor lets XLA pick a transposed
        # {1,2,0} layout for it (serving the gram dots) at the price of four
        # full-tensor relayouts, ~22 ms/step at 480x640 b8 — the top ops of
        # the round-2 profile (OPTIMIZATION.md round-2 addendum 7). Opt back
        # into token flattening with SEGMIF_AB=ffm_tokens (A/B switch; read
        # at TRACE time — flipping it after a function is jitted has no
        # effect, each variant needs a fresh jit. Measured SLOWER on v5e:
        # 153.2 vs 146.4 ms fusion core, e7 round-3).
        if (self.interaction == "both" and not self.return_context
                and not ab("ffm_tokens")):
            tw = token_weight
            # when a gram_slice is given, it subsumes the weight on the
            # folded path (the weight stays the token-path fallback below)
            if gram_slice is not None:
                tw = None
            elif tw is not None and tw.ndim != x1.ndim - 1:
                # flat [1|B, N] weight -> the caller's leading layout, so the
                # strip-persistent trunk keeps its layout through the FFM
                tw = tw.reshape((tw.shape[0],) + x1.shape[1:-1])
            return cross(x1, x2, seg, tw, gram_slice)
        # modular / context-returning / token-weighted paths flatten to
        # tokens (their per-head attention modules index [B, N, C]);
        # gram_slice is layout-bound — callers that use it must also pass
        # the equivalent token_weight for this fallback
        shp = x1.shape
        b, c = shp[0], shp[-1]
        t1 = x1.reshape(b, -1, c)
        t2 = x2.reshape(b, -1, c)
        ts = seg.reshape(b, -1, seg.shape[-1])
        out = cross(t1, t2, ts, token_weight)
        t1 = out[0].reshape(shp)
        t2 = out[1].reshape(shp)
        if self.return_context:
            return t1, t2, out[2]
        return t1, t2


class AttentionModule(nn.Module):
    """Sigmoid-gated conv attention (model_fusion.py:759-771): conv3x3 ->
    ReLU -> conv3x3 -> sigmoid(y) * y (the gate multiplies the CONV OUTPUT,
    not the input — the reference's `out * x1` where x1 is post-conv)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_CONV_INIT, dtype=self.dtype,
                    name="conv_a")(x)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_CONV_INIT, dtype=self.dtype,
                    name="conv_b")(y)
        return jax.nn.sigmoid(y) * y


class FusionNetwork(nn.Module):
    """The deployed fusion net (`Fusion_Network3_ac`, model_fusion.py:1026-1067).

    ir, vis_y: [B, H, W, >=1] (only channel 0 is used, as in the reference);
    seg_tap1: encoder stage-1 tap (64 ch), seg_tap2: stage-2 tap (128 ch) —
    each either at FULL [B, H, W, C] resolution (the reference
    forward_fusion layout) or at the stage's native resolution (preferred:
    the 1x1 proj commutes with the bilinear upsample, so the tap is
    projected cheap at low res and upsampled straight into the trunk
    layout; same checkpoint weights). Returns fused Y [B, H, W, 1].

    interaction: 'both' | 'moam' | 'soam' (FFM variants), 'concat'
    (Fusion_Network3_Con), 'add' (Fusion_Network3_Add), 'average'
    (Fusion_Network3_Average: 8 sigmoid-gated AttentionModules att1..att8,
    model_fusion.py:772-819), 'none' (Fusion_Network_rmseg — seg taps
    ignored).

    tail: 'deep' = the deployed _ac tail conv2->conv21(ch/2)->conv22(1);
    'short' = the 32-ch ablation variants' tail conv2->conv21(1)
    (_S/_M/_Con/_Add/_Average end at conv21, model_fusion.py:810-818).
    """
    channels: int = 64
    num_heads: int = 8
    interaction: str = "both"
    tail: str = "deep"
    dtype: jnp.dtype = jnp.float32
    return_attention: bool = False  # Fusion_Network3_obtainattention parity
    remat: bool = False  # rematerialize DRDBs + FFM rounds under grad
                         # (the dense-growth activations dominate training
                         # HBM at full resolution; see OPTIMIZATION.md)
    quant: str = "none"  # DRDB precision: "none" | "calibrate" | "int8"
                         # (serving-path PTQ; see kernels/int8.py and
                         # serving.make_serving_fn(int8_calibration=...))

    @nn.compact
    def __call__(self, ir, vis_y, seg_tap1: Optional[jnp.ndarray] = None,
                 seg_tap2: Optional[jnp.ndarray] = None):
        ch = self.channels
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        drdb_cls = (nn.remat(DRDB, static_argnums=(2,)) if self.remat
                    else DRDB)
        # remat covers the DRDBs only: keeping the FFM's activations and
        # skipping its backward replay measured FASTER at full training
        # shape and fits b8 HBM (round-5: 11.89 vs 11.48 pairs/s train).
        # SEGMIF_AB=remat_ffm (trace-time) restores the replay for
        # memory-constrained shapes.
        ffm_cls = (nn.remat(FeatureFusionModule)
                   if self.remat and ab("remat_ffm")
                   else FeatureFusionModule)
        # one FFM instance called at both interaction rounds = weight sharing,
        # the reference's (quirky but behavior-defining) layout
        ffm = None
        if self.interaction in ("both", "moam", "soam"):
            ffm = ffm_cls(ch, self.num_heads, self.interaction,
                          self.dtype, self.return_attention, name="ffm")
        attn_maps = []
        # Strip-persistent trunk (TPU): ONE phase+strip split per trunk
        # input; the DRDBs run directly on phase halo strips (the fast conv
        # regime, no per-DRDB layout transforms), the FFM rounds run on the
        # strip tokens with an owned-row gram weight (exact — each image
        # pixel counted once), halos are refreshed between DRDBs by cheap
        # row copies, and ONE merge feeds the dil-1 tail. moam/soam use the
        # plain phase-plane trunk (their modular attention has no gram
        # weight); return_attention falls back to image space.
        import os

        trunk = "image"
        # 'average' stays in image space: its 3x3 AttentionModule convs are
        # layout-sensitive (a phase plane is a 2x-subsampled image)
        if (not self.return_attention and self.interaction != "average"
                and _use_phase_trunk(ir.shape[1], ir.shape[2])):
            # 'phase' is the default again since the no-half-materialization
            # FFM fold landed (kernels/pallas_ffm.py): measured on v5e b8
            # 480x640 (e10), phase 134.1 ms vs the best strips combo
            # 142.1 ms. The strips trunk briefly won mid-round-3 (139.6 vs
            # 152.5, e9) because the OLD fold materialized y/u slice halves
            # whose relayout cost the phase trunk paid in full; with those
            # gone, strips' halo-row overcompute (proj+FFM run on
            # rows=strip+2*halo) outweighs the per-DRDB strip
            # gather/scatter it saves. SEGMIF_AB=strips_trunk opts back in
            # (trace-time A/B switch, parity-tested). moam/soam always use
            # phase planes (their modular attention has no gram weight).
            trunk = ("strips" if (ab("strips_trunk")
                                  and self.interaction
                                  not in ("moam", "soam"))
                     else "phase")
        if trunk != "image":
            from ..kernels.pallas_drdb import (
                _PHASE_HALO, _phase_strip_for, _phase_strips, merge_strips,
                owned_token_weight, phase_merge, phase_split,
                refresh_strip_halos, split_strips, strip_row_mask)
        tw = mask = gs = None
        if trunk == "strips":
            b, hh, ww = ir.shape[0], ir.shape[1], ir.shape[2]
            hp, wp = hh // 2, ww // 2
            strip = _phase_strip_for(hp, wp)
            halo = _PHASE_HALO
            n_strips = hp // strip
            rows = strip + 2 * halo
            # gram over the owned-row window: SEGMIF_AB=strips_gram_slice
            # (trace-time A/B) makes the folded FFM read a SLICE of the
            # [B, 4, n, rows, wp, C] view for its gram reductions instead
            # of multiplying by the 0/1 weight. Measured SLOWER in-context
            # (e10: 146.5 vs 145.4 ms — XLA materializes the strided row
            # window, costing more than the weight broadcast it avoids), so
            # the weight-multiply gram is the default.
            if ab("strips_gram_slice"):
                gs = lambda t: t[:, :, :, halo:halo + strip]  # noqa: E731
            tw = owned_token_weight(b, n_strips, strip, halo, wp, jnp.float32)
            mask = strip_row_mask(b, n_strips, strip, halo, hp)

        def to_trunk(t):
            if trunk == "strips":
                return split_strips(t, strip, halo)[0]
            if trunk == "phase":
                return phase_split(t)
            return t

        def img6(t):
            # strips flat [B*4*n, rows, wp, C] -> per-image [B, ...] view
            # for the token-level FFM (free reshape)
            if trunk == "strips":
                return t.reshape(b, 4, n_strips, rows, wp, t.shape[-1])
            return t

        def flat4(t):
            if trunk == "strips":
                return t.reshape(b * 4 * n_strips, rows, wp, t.shape[-1])
            return t

        # NOTE: computing conv1 directly into phase layout as 4 offset
        # stride-2 convs was measured SLOWER on v5e than conv + split (XLA
        # fuses the phase transpose into the conv's output write): 4.6 vs
        # 2.8 ms standalone — keep the straightforward form.
        k_ir, b_ir = _ConvWeights(1, ch, 3, name="conv1_ir")()
        k_vis, b_vis = _ConvWeights(1, ch, 3, name="conv1_vis")()

        def conv3x3(t, k, b):
            return jax.lax.conv_general_dilated(
                t.astype(self.dtype), k.astype(self.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b.astype(self.dtype)

        if ab("conv1_paired") and trunk != "image":
            # ONE entry conv + ONE phase split on the channel-paired pair
            # instead of two of each (identical math: block-diagonal kernel
            # over the 2 input channels; prelu commutes with the concat).
            # Trace-time A/B switch (flipping after jit has no effect).
            kp = jnp.zeros((3, 3, 2, 2 * ch), self.dtype)
            kp = kp.at[:, :, 0, :ch].set(k_ir[:, :, 0].astype(self.dtype))
            kp = kp.at[:, :, 1, ch:].set(k_vis[:, :, 0].astype(self.dtype))
            bp = jnp.concatenate([b_ir, b_vis]).astype(self.dtype)
            pair = jnp.concatenate([ir[..., 0:1], vis_y[..., 0:1]], -1)
            x12 = to_trunk(_prelu(conv3x3(pair, kp, bp), alpha))
            x1, x2 = x12[..., :ch], x12[..., ch:]
        else:
            x1 = to_trunk(_prelu(conv3x3(ir[..., 0:1], k_ir, b_ir), alpha))
            x2 = to_trunk(_prelu(conv3x3(vis_y[..., 0:1], k_vis, b_vis),
                                 alpha))
        x1 = drdb_cls(ch, dtype=self.dtype, quant=self.quant,
                      name="drdb1")(x1, trunk, mask)
        x2 = drdb_cls(ch, dtype=self.dtype, quant=self.quant,
                      name="drdb2")(x2, trunk, mask)

        def tap_to_trunk(tap, name):
            """seg tap -> trunk layout. Accepts the tap at FULL resolution
            (the reference's forward_fusion output, proj applied as-is) or at
            the encoder stage's NATIVE resolution: a 1x1 conv commutes with
            bilinear upsampling (both linear; the operator's rows sum to 1 so
            the bias commutes too), so the SAME checkpoint weights apply at
            low res — 16x/64x fewer proj FLOPs — and the upsample lands
            directly in phase layout, skipping a full-res phase transpose."""
            proj = nn.Conv(ch, (1, 1), kernel_init=_CONV_INIT,
                           dtype=self.dtype, name=name)
            if tap.shape[1] == ir.shape[1]:   # full-res (reference layout)
                return to_trunk(proj(tap))
            s = proj(tap)
            if trunk == "image":
                from ..ops.image import resize_bilinear

                return resize_bilinear(s, ir.shape[1:3]).astype(self.dtype)
            from ..ops.image import resize_bilinear_phase

            sp = resize_bilinear_phase(s, ir.shape[1:3])
            if trunk == "strips":
                return _phase_strips(sp, strip, halo)[0]
            return sp

        if self.interaction != "none":
            x1, x2 = self._interact(img6(x1), img6(x2),
                                    img6(tap_to_trunk(seg_tap1, "seg_proj1")),
                                    ffm, 1, attn_maps, tw, gs)
            x1, x2 = flat4(x1), flat4(x2)
        if trunk == "strips":
            x1 = refresh_strip_halos(x1, b, strip, halo)
            x2 = refresh_strip_halos(x2, b, strip, halo)
        x1 = drdb_cls(ch, dtype=self.dtype, quant=self.quant,
                      name="drdb3")(x1, trunk, mask)
        x2 = drdb_cls(ch, dtype=self.dtype, quant=self.quant,
                      name="drdb4")(x2, trunk, mask)
        if self.interaction != "none":
            x1, x2 = self._interact(img6(x1), img6(x2),
                                    img6(tap_to_trunk(seg_tap2, "seg_proj2")),
                                    ffm, 2, attn_maps, tw, gs)
            x1, x2 = flat4(x1), flat4(x2)

        k2, b2 = _ConvWeights(2 * ch, ch, 3, name="conv2")()
        short_tail = self.tail == "short"
        conv21 = nn.Conv(1 if short_tail else ch // 2, (3, 3),
                         padding=[(1, 1), (1, 1)],
                         kernel_init=_CONV_INIT, dtype=self.dtype,
                         name="conv21")
        conv22 = None if short_tail else nn.Conv(
            1, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=_CONV_INIT, dtype=self.dtype, name="conv22")
        split2 = (ab("conv2_split")
                  and trunk == "phase" and _use_strips())
        if not split2:
            y = jnp.concatenate([x1, x2], axis=-1)
            if trunk == "strips":
                y = merge_strips(y, b, strip, halo)
            elif trunk == "phase":
                y = phase_merge(y)
        tail_strip = None
        if _use_strips():
            from ..kernels.strips import pick_strip

            hh, ww = ir.shape[1], ir.shape[2]
            tail_strip = pick_strip(hh, ww, halo=3)
        if split2 and tail_strip is None:
            split2 = False
            y = phase_merge(jnp.concatenate([x1, x2], axis=-1))
        if tail_strip is not None:
            # fast small-plane conv regime via H halo strips; re-zero rows
            # outside the true image after each prelu so the next conv sees
            # the reference's zero padding at the image border
            from ..kernels.strips import from_strips, to_strips

            if split2:
                # conv2 over concat == conv(x1-half) + conv(x2-half): the
                # [B,H,W,128] concat buffer (2.3 ms at 480x640 b8, e12
                # profile) never materializes. Trace-time A/B switch.
                bsz = x1.shape[0]
                y1s, m = to_strips(phase_merge(x1), tail_strip, halo=3)
                y2s, _ = to_strips(phase_merge(x2), tail_strip, halo=3)
                ys = (conv3x3(y1s, k2[:, :, :ch], b2)
                      + conv3x3(y2s, k2[:, :, ch:], jnp.zeros_like(b2)))
                ys = _prelu(ys, alpha) * m
            else:
                bsz = y.shape[0]
                ys, m = to_strips(y, tail_strip, halo=3)
                ys = _prelu(conv3x3(ys, k2, b2), alpha) * m
            if conv22 is None:
                ys = _prelu(conv21(ys), alpha)
            else:
                ys = _prelu(conv21(ys), alpha) * m
                ys = _prelu(conv22(ys), alpha)
            y = from_strips(ys, bsz, tail_strip, halo=3)
        else:
            y = _prelu(conv3x3(y, k2, b2), alpha)
            y = _prelu(conv21(y), alpha)
            if conv22 is not None:
                y = _prelu(conv22(y), alpha)
        if self.return_attention:
            return y, attn_maps
        return y

    def _interact(self, x1, x2, s, ffm, round_idx, attn_maps,
                  token_weight=None, gram_slice=None):
        if self.interaction in ("both", "moam", "soam"):
            import os

            if ab("ffm_barrier"):
                # keep XLA from fusing the surrounding layout transforms
                # into the FFM matmuls (experiment; see OPTIMIZATION.md)
                x1, x2, s = jax.lax.optimization_barrier((x1, x2, s))
            # weight-shared FFM across both rounds — the reference reuses
            # self.ffm and never calls ffm2 (model_fusion.py:1058,1061)
            out = ffm(x1, x2, s, token_weight, gram_slice)
            if ab("ffm_barrier"):
                out = jax.lax.optimization_barrier(out)
            if self.return_attention:
                attn_maps.append(out[2])
                return out[0], out[1]
            return out
        if self.interaction == "concat":
            shp = x1.shape  # phase layout is rank-5; convs want rank-4
            flat = (lambda t: t.reshape((-1,) + shp[-3:-1] + (t.shape[-1],)))
            f1 = nn.Conv(self.channels, (1, 1), kernel_init=_CONV_INIT,
                         dtype=self.dtype, name=f"cat_proj1_r{round_idx}")(
                flat(jnp.concatenate([x1, s], axis=-1)))
            f2 = nn.Conv(self.channels, (1, 1), kernel_init=_CONV_INIT,
                         dtype=self.dtype, name=f"cat_proj2_r{round_idx}")(
                flat(jnp.concatenate([x2, s], axis=-1)))
            return f1.reshape(shp), f2.reshape(shp)
        if self.interaction == "add":
            return x1 + s, x2 + s
        if self.interaction == "average":
            # Fusion_Network3_Average wiring (model_fusion.py:800-808):
            # round 1 uses att1..att4 on (x1, seg, x2, seg), round 2 uses
            # att5..att8 on the same pattern with the second seg tap
            base = (round_idx - 1) * 4 + 1

            def att(i, t):
                return AttentionModule(self.channels, self.dtype,
                                       name=f"att{i}")(t)

            return att(base, x1) + att(base + 1, s), \
                att(base + 2, x2) + att(base + 3, s)
        raise ValueError(f"unknown interaction {self.interaction!r}")


class SimpleFusionNetwork(nn.Module):
    """Legacy 2-input fusion net without seg interaction
    (Fusion_Network, model_fusion.py:158-182): concat IR/VIS Y, conv,
    2 DRDBs, conv to 1ch, clip + global min-max."""
    channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ir, vis_y):
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        x = jnp.concatenate([ir[..., 0:1], vis_y[..., 0:1]], axis=-1)
        x = nn.Conv(self.channels * 2, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_CONV_INIT, dtype=self.dtype, name="conv1")(x)
        x = _prelu(x, alpha)
        x = DRDB(self.channels * 2, dtype=self.dtype, name="drdb1")(x)
        x = DRDB(self.channels * 2, dtype=self.dtype, name="drdb2")(x)
        x = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=_CONV_INIT,
                    dtype=self.dtype, name="conv2")(x)
        x = _prelu(x, alpha)
        x = jnp.clip(x, 0.0, 1.0)
        return minmax_stretch(x)
