"""MiT (Mix Vision Transformer) backbone — the SegFormer encoder — in Flax.

TPU-native re-design of the reference encoder
(/root/reference/core/mix_transformer.py:201-434): a 4-stage hierarchical ViT
with overlapping patch embeddings (strides 4/2/2/2), spatially-reduced
efficient self-attention (sr_ratio 8/4/2/1) and Mix-FFN (depthwise 3x3 conv
inside the MLP). Differences from the reference are layout/idiom, not math:

 - NHWC feature maps and [B, N, C] token tensors (TPU-friendly; no permutes).
 - attention runs through `segmif_tpu.kernels.attention.sr_attention`, which
   dispatches to a fused Pallas kernel on TPU and an XLA einsum elsewhere.
 - stochastic depth (DropPath) is a pure function keyed by an explicit rng.
 - GELU is exact (erf), matching torch nn.GELU (jax default is tanh-approx).
 - LayerNorm eps: 1e-6 for block/stage norms (reference passes
   partial(LayerNorm, eps=1e-6)); 1e-5 for the patch-embed and sr norms
   (reference leaves those at the torch default).

Returns the four stage feature maps at 1/4, 1/8, 1/16, 1/32 resolution;
`forward_fusion` additionally upsamples stages 1-2 back to input resolution —
the feature taps consumed by the fusion network's interactive attention
(/root/reference/core/mix_transformer.py:358-375).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.attention import sr_attention
from ..ops.image import resize_bilinear

_DENSE_INIT = nn.initializers.truncated_normal(stddev=0.02)
_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


@dataclasses.dataclass(frozen=True)
class MiTConfig:
    embed_dims: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 4, 18, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)


# Size variants, matching /root/reference/core/mix_transformer.py:389-434.
MIT_VARIANTS = {
    "mit_b0": MiTConfig(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": MiTConfig(depths=(2, 2, 2, 2)),
    "mit_b2": MiTConfig(depths=(3, 4, 6, 3)),
    "mit_b3": MiTConfig(depths=(3, 4, 18, 3)),
    "mit_b4": MiTConfig(depths=(3, 8, 27, 3)),
    "mit_b5": MiTConfig(depths=(3, 6, 40, 3)),
}


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
              rng: jax.Array | None) -> jnp.ndarray:
    """Stochastic depth: drop the residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class OverlapPatchEmbed(nn.Module):
    """Strided overlapping conv patch embedding + LayerNorm over tokens."""
    embed_dim: int
    patch_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        p = self.patch_size // 2
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            kernel_init=_CONV_INIT, dtype=self.dtype, name="proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x, h, w


class EfficientSelfAttention(nn.Module):
    """Spatially-reduced self-attention: K/V computed from an sr-strided conv
    of the token grid, shrinking attention cost by sr^2
    (/root/reference/core/mix_transformer.py:94-115)."""
    dim: int
    num_heads: int
    sr_ratio: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                         kernel_init=_CONV_INIT, dtype=self.dtype, name="sr")(xs)
            xs = xs.reshape(b, -1, c)
            xs = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xs)
        else:
            xs = x
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, kernel_init=_DENSE_INIT,
                      dtype=self.dtype, name="kv")(xs)
        m = xs.shape[1]
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = kv[..., :c].reshape(b, m, self.num_heads, head_dim)
        v = kv[..., c:].reshape(b, m, self.num_heads, head_dim)
        out = sr_attention(q, k, v, scale)
        out = out.reshape(b, n, c)
        out = nn.Dense(c, kernel_init=_DENSE_INIT, dtype=self.dtype,
                       name="proj")(out)
        return out


def depthwise_conv3x3_shift(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 'same' conv as 9 shifted multiply-adds (pure VPU).

    x: [B, H, W, C]; kernel: [3, 3, 1, C] (nn.Conv HWIO layout); bias: [C].
    XLA's grouped-conv lowering of depthwise convs is catastrophically slow
    on TPU when a matmul consumes the result (measured 10x on a stage-3
    MixFFN, see OPTIMIZATION.md); this formulation fuses into a single
    elementwise pass over 9 shifted reads."""
    h, w = x.shape[1], x.shape[2]
    k = kernel[:, :, 0].astype(x.dtype)  # [3, 3, C]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = xp[:, dy:dy + h, dx:dx + w, :] * k[dy, dx]
            acc = t if acc is None else acc + t
    return acc + bias.astype(x.dtype)


class _DWConvWeights(nn.Module):
    """Raw depthwise-conv params in nn.Conv's {kernel [3,3,1,C], bias [C]}
    layout (keeps the checkpoint tree while the compute path uses the
    shift formulation)."""
    channels: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", _CONV_INIT, (3, 3, 1, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return kern, bias


class MixFFN(nn.Module):
    """fc1 -> depthwise 3x3 conv -> GELU(exact) -> fc2
    (/root/reference/core/mix_transformer.py:18-53,376-387)."""
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, _ = x.shape
        x = nn.Dense(self.hidden_dim, kernel_init=_DENSE_INIT,
                     dtype=self.dtype, name="fc1")(x)
        x = x.reshape(b, h, w, self.hidden_dim)
        dk, db = _DWConvWeights(self.hidden_dim, name="dwconv")()
        x = depthwise_conv3x3_shift(x, dk, db)
        x = x.reshape(b, n, self.hidden_dim)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, kernel_init=_DENSE_INIT, dtype=self.dtype,
                     name="fc2")(x)
        return x


class Block(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int
    qkv_bias: bool
    drop_path_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, deterministic: bool = True):
        rng1 = rng2 = None
        if not deterministic and self.drop_path_rate > 0.0:
            rng1 = self.make_rng("droppath")
            rng2 = self.make_rng("droppath")
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = EfficientSelfAttention(self.dim, self.num_heads, self.sr_ratio,
                                   self.qkv_bias, self.dtype, name="attn")(y, h, w)
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng1)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MixFFN(self.dim * self.mlp_ratio, self.dim, self.dtype,
                   name="mlp")(y, h, w)
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng2)
        return x


class MixVisionTransformer(nn.Module):
    config: MiTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM in training)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """x: NHWC image. Returns [c1, c2, c3, c4] NHWC feature maps."""
        cfg = self.config
        block_cls = nn.remat(Block, static_argnums=(2, 3, 4)) if self.remat \
            else Block
        total_depth = sum(cfg.depths)
        dpr = [cfg.drop_path_rate * i / max(total_depth - 1, 1)
               for i in range(total_depth)]
        outs = []
        cur = 0
        b = x.shape[0]
        for stage in range(4):
            x, h, w = OverlapPatchEmbed(
                cfg.embed_dims[stage], cfg.patch_sizes[stage],
                cfg.strides[stage], self.dtype,
                name=f"patch_embed{stage + 1}")(x)
            for i in range(cfg.depths[stage]):
                x = block_cls(cfg.embed_dims[stage], cfg.num_heads[stage],
                              cfg.sr_ratios[stage], cfg.mlp_ratios[stage],
                              cfg.qkv_bias, dpr[cur + i], self.dtype,
                              name=f"block{stage + 1}_{i}")(x, h, w,
                                                            deterministic)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{stage + 1}")(x)
            x = x.reshape(b, h, w, cfg.embed_dims[stage])
            outs.append(x)
            cur += cfg.depths[stage]
        return outs


def fusion_taps(features: Sequence[jnp.ndarray], out_hw: Tuple[int, int]):
    """Bilinearly upsample stage-1/2 features to the input resolution — the
    encoder->fusion-net bridge (/root/reference/core/mix_transformer.py:358-375).
    (The shift-lerp integer-factor formulation in ops.image was measured 4x
    SLOWER than jax.image.resize's dot lowering on v5e — not used here.)"""
    out0 = resize_bilinear(features[0], out_hw)
    out1 = resize_bilinear(features[1], out_hw)
    return out0, out1
