"""Model compositions: segmentation model, ImageNet-normalizing wrapper, and
the single-graph joint fusion+segmentation pipeline.

Re-designs of /root/reference/core/model_fusion.py compositions:
 - SegModel  <- WeTr (:9-68): MiT encoder + SegFormer head + aux 1x1
   classifier on stage-4 (computed then discarded in the reference's forward;
   we keep the parameters and expose it via `return_cam` for parity).
 - SegmentationNetwork <- Network3 (:1068-1104): takes [0,1] RGB, applies
   ImageNet normalization (functionally, not in-place), returns 1/4-res
   logits.
 - JointPipeline: the whole SegMiF inference stack — seg-encoder feature taps
   on the mask image, fusion net, YCrCb recombination — as ONE jittable
   function (the reference splits this across test_fusion.py:100-111 with a
   PNG round-trip; here it is a single XLA graph, the BASELINE.json
   north-star requirement).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.color import recombine_fused, rgb_to_ycrcb
from ..ops.image import normalize_imagenet, resize_bilinear
from .fusion import FusionNetwork
from .mit import MIT_VARIANTS, MixVisionTransformer, fusion_taps
from .segformer_head import SegFormerHead

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class SegModel(nn.Module):
    """MiT encoder + SegFormer decode head (+ aux classifier params)."""
    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.encoder = MixVisionTransformer(MIT_VARIANTS[self.backbone],
                                            self.dtype, remat=self.remat)
        self.decoder = SegFormerHead(self.num_classes, self.embedding_dim,
                                     dtype=self.dtype)
        self.classifier = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                                  kernel_init=_CONV_INIT, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 return_cam: bool = False):
        feats = self.encoder(x, deterministic)
        logits = self.decoder(feats, deterministic)
        # the reference computes the aux classifier unconditionally and
        # discards it (core/model_fusion.py:62-68); calling it keeps the
        # param tree checkpoint-compatible and XLA removes the dead compute
        cam = self.classifier(feats[-1])
        if return_cam:
            return logits, cam
        return logits

    def encode(self, x: jnp.ndarray, deterministic: bool = True):
        """The four encoder stage features (NHWC)."""
        return self.encoder(x, deterministic)

    def encode_fusion_taps(self, x: jnp.ndarray, deterministic: bool = True):
        """Stage-1/2 features upsampled to input resolution — the bridge into
        the fusion network (reference forward_fusion,
        core/mix_transformer.py:358-375)."""
        feats = self.encoder(x, deterministic)
        return fusion_taps(feats, x.shape[1:3])

    def encode_taps_raw(self, x: jnp.ndarray, deterministic: bool = True):
        """Stage-1/2 features at their NATIVE resolution (H/4, H/8) — the
        fusion net upsamples them itself (proj-at-low-res + phase-layout
        upsample; same math as encode_fusion_taps + full-res proj, 16x/64x
        cheaper proj and no full-res phase transpose)."""
        feats = self.encoder(x, deterministic)
        return feats[0], feats[1]


class SegmentationNetwork(nn.Module):
    """[0,1] RGB in, 1/4-res class logits out (Network3 equivalent).

    The reference returns (input, input, logits); callers here just get
    logits."""
    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.seg = SegModel(self.backbone, self.num_classes,
                            self.embedding_dim, self.dtype, self.remat)

    def __call__(self, rgb01: jnp.ndarray, deterministic: bool = True):
        x = normalize_imagenet(rgb01).astype(self.dtype)
        return self.seg(x, deterministic)

    def logits_at(self, rgb01: jnp.ndarray, size, deterministic: bool = True):
        """Logits bilinearly upsampled to `size` (label resolution), as in
        Network3._loss (model_fusion.py:1090-1097)."""
        logits = self(rgb01, deterministic)
        return resize_bilinear(logits.astype(jnp.float32), size)

    def encode_fusion_taps(self, rgb01: jnp.ndarray,
                           deterministic: bool = True):
        """NOTE: the reference feeds the guide image to forward_fusion RAW in
        [0,1] — NO x255/ImageNet normalization (train.py:358,
        test_fusion.py:100 call encoder.forward_fusion directly, bypassing
        Network3.forward's normalize). Checkpoint parity requires the same."""
        return self.seg.encode_fusion_taps(rgb01.astype(self.dtype),
                                           deterministic)

    def encode_taps_raw(self, rgb01: jnp.ndarray, deterministic: bool = True):
        """Native-resolution stage-1/2 taps; same raw-[0,1]-input semantics
        as encode_fusion_taps (no x255/ImageNet normalize)."""
        return self.seg.encode_taps_raw(rgb01.astype(self.dtype),
                                        deterministic)


class JointPipeline(nn.Module):
    """Full fuse+segment model in one graph.

    Parameters split into two logical roles matching the reference's two
    checkpoints: 'seg' (Network3 / model-fusion_add_final2.pth) and 'fusion'
    (Fusion_Network3_ac / modelfusion-final2.pth).
    """
    backbone: str = "mit_b3"
    num_classes: int = 9
    embedding_dim: int = 256
    interaction: str = "both"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize encoder blocks + fusion DRDB/FFM
                         # (trade recompute for HBM; enables full-res
                         # large-batch TRAINING that otherwise OOMs)
    quant: str = "none"  # DRDB precision for the serving path: "none" |
                         # "calibrate" (one recording pass fills the
                         # 'quant' collection with activation amaxes) |
                         # "int8" (calibrated int8 DRDB convs,
                         # kernels/int8.py; measured 2x MXU rate on v5e)
    remat_seg: Optional[bool] = None  # override remat for the seg branch
                         # only (None = follow `remat`). The fusion-phase
                         # train step differentiates THROUGH the frozen seg
                         # net; its activation footprint differs 4x from
                         # the fusion net's, so the optimal remat split is
                         # an empirical question (e21, OPTIMIZATION.md r4).

    def setup(self):
        rs = self.remat if self.remat_seg is None else self.remat_seg
        self.seg = SegmentationNetwork(self.backbone, self.num_classes,
                                       self.embedding_dim, self.dtype,
                                       rs)
        self.fusion = FusionNetwork(interaction=self.interaction,
                                    dtype=self.dtype, remat=self.remat,
                                    quant=self.quant)

    def guide_taps(self, guide_rgb: jnp.ndarray,
                   deterministic: bool = True):
        """Seg-encoder stage-1/2 feature taps for a guide image.

        At inference the guide is a STATIC per-dataset image (the reference
        recomputes its encoder features per pair, test_fusion.py:100); in
        serving mode callers precompute this once and pass the result back
        via `taps=`, removing one full encoder pass from the hot path.
        Full-resolution (reference forward_fusion layout); prefer
        guide_taps_raw for the hot path — `taps=` accepts either."""
        return self.seg.encode_fusion_taps(guide_rgb, deterministic)

    def guide_taps_raw(self, guide_rgb: jnp.ndarray,
                       deterministic: bool = True):
        """Native-resolution guide taps (16x/64x smaller than guide_taps;
        the fusion net upsamples them into its trunk layout itself)."""
        return self.seg.encode_taps_raw(guide_rgb, deterministic)

    def fuse(self, ir: jnp.ndarray, vis_rgb: jnp.ndarray,
             guide_rgb: Optional[jnp.ndarray] = None,
             deterministic: bool = True, taps=None,
             vis_channel: str = "r"):
        """ir: [B,H,W,1] in [0,1]; vis_rgb: [B,H,W,3] in [0,1];
        guide_rgb: image whose seg-encoder features steer the fusion (the
        reference feeds the previous round's fused image from Mask2/;
        defaults to vis_rgb). `taps=(tap1, tap2)` overrides the guide-encoder
        pass with precomputed features (serving mode).

        vis_channel picks which plane of vis_rgb feeds the fusion net's VIS
        branch. The reference is INCONSISTENT: Fusion_Network3_ac slices
        channel 0 of whatever it gets (model_fusion.py:1052); training feeds
        RGB2YCrCb(vis) so channel 0 is Y (train.py:355-359), but EVERY
        inference/regeneration path feeds raw RGB so channel 0 is R
        (test_fusion.py:101, val_performance.py:57,655). "r" (default)
        matches the deployed inference behavior for converted-checkpoint
        output parity; "y" gives the train-time semantics.
        Returns (fused_rgb [0,1], fused_y)."""
        if taps is None:
            if guide_rgb is None:
                guide_rgb = vis_rgb
            taps = self.seg.encode_taps_raw(guide_rgb, deterministic)
        tap1, tap2 = taps
        vis_ycrcb = rgb_to_ycrcb(vis_rgb)
        vis_in = (vis_rgb[..., 0:1] if vis_channel == "r"
                  else vis_ycrcb[..., 0:1])
        fused_y = self.fusion(ir, vis_in, tap1, tap2)
        fused_rgb = recombine_fused(fused_y, vis_ycrcb)
        return fused_rgb, fused_y

    def __call__(self, ir: jnp.ndarray, vis_rgb: jnp.ndarray,
                 guide_rgb: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, taps=None,
                 vis_channel: str = "r"):
        """Fuse then segment the fused image. Returns (fused_rgb, fused_y,
        seg_logits at 1/4 resolution)."""
        fused_rgb, fused_y = self.fuse(ir, vis_rgb, guide_rgb, deterministic,
                                       taps=taps, vis_channel=vis_channel)
        logits = self.seg(fused_rgb, deterministic)
        return fused_rgb, fused_y, logits
