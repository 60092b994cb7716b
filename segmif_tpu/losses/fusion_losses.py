"""Fusion losses, pure jnp on NHWC tensors.

TPU-native equivalents of /root/reference/core/loss.py's fusion-loss family.
All functions take [B, H, W, C] tensors in [0,1]; only channel 0 (the Y
channel) of multi-channel inputs is used, as in the reference. Each loss is
a pure function designed to fuse into the surrounding training-step jit.

Mapping to reference classes:
 - fusion_loss_l1_grad       <- Fusionloss3 (loss.py:459-476): round-1 loss,
                                L1(fused, mask_Y) + L1(sobel(fused), sobel(mask_Y)).
 - fusion_loss_mse_ssim      <- Fusionloss_grad3 (loss.py:506-517): round>=2,
                                MSE(fused, mask_Y) + 1.1*(1 - SSIM).
 - fusion_loss_max_grad      <- Fusionloss (loss.py:423-440): L1 against the
                                per-pixel max of IR/VIS-Y plus 8x Sobel-gradient
                                L1 against the max gradient.
 - fusion_loss_mask_l1       <- Fusionloss2 (loss.py:441-457): plain L1 vs mask.
 - fusion_loss_l1_lap        <- Fusionloss_grad (loss.py:479-490): L1 + 0.8*LapLoss2.
 - fusion_loss_mse_lap_ssim  <- Fusionloss_grad2 (loss.py:492-505):
                                L1 + 0.1*LapLoss2 + 1.1*(1-SSIM).
 - laplacian_pyramid_max_l1  <- LapLoss2 (lap_loss.py:101-118).
 - laplacian_pyramid_l1      <- LapLoss (lap_loss.py:83-99).
 - iqa_entropy_loss          <- IQALoss (loss.py:605-633): negative patch
                                entropy quality term.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.entropy import patch_entropy
from ..ops.filters import sobel_magnitude, unsharp_pyramid
from ..ops.ssim import ssim


def _y(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0:1]


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def fusion_loss_l1_grad(ir, vis, fused_y, mask) -> jnp.ndarray:
    """Round-1 fusion loss (Fusionloss3)."""
    target = _y(mask)
    loss_in = l1(target, fused_y)
    loss_grad = l1(sobel_magnitude(target), sobel_magnitude(fused_y))
    return loss_in + loss_grad


def fusion_loss_mse_ssim(ir, vis, fused_y, mask,
                         ssim_weight: float = 1.1) -> jnp.ndarray:
    """Round>=2 fusion loss (Fusionloss_grad3)."""
    target = _y(mask)
    return mse(target, fused_y) + ssim_weight * (1.0 - ssim(fused_y, target))


def fusion_loss_max_grad(ir, vis, fused_y, grad_weight: float = 8.0):
    """Max-intensity + Sobel-gradient loss (Fusionloss)."""
    iry, visy = _y(ir), _y(vis)
    loss_in = l1(jnp.maximum(visy, iry), fused_y)
    grad_joint = jnp.maximum(sobel_magnitude(visy), sobel_magnitude(iry))
    loss_grad = l1(grad_joint, sobel_magnitude(fused_y))
    return loss_in + grad_weight * loss_grad


def fusion_loss_mask_l1(ir, vis, fused_y, mask) -> jnp.ndarray:
    """Plain L1 vs the mask target (Fusionloss2)."""
    return l1(_y(mask), fused_y)


def laplacian_pyramid_l1(pred, target, weights=(10.0, 10.0, 1.0)):
    """LapLoss: weighted L1 across band-pass levels (lap_loss.py:83-99)."""
    pp = unsharp_pyramid(pred)
    tp = unsharp_pyramid(target)
    return sum(w * l1(a, b) for w, a, b in zip(weights, pp, tp))


def laplacian_pyramid_max_l1(fused_y, ir, vis, weights=(10.0, 10.0, 1.0)):
    """LapLoss2: per-level L1 against max(IR, VIS) band-pass."""
    fp = unsharp_pyramid(_y(fused_y))
    ip = unsharp_pyramid(_y(ir))
    vp = unsharp_pyramid(_y(vis))
    return sum(w * l1(a, jnp.maximum(b, c))
               for w, a, b, c in zip(weights, fp, ip, vp))


def fusion_loss_l1_lap(ir, vis, fused_y, mask, lap_weight: float = 0.8):
    """Fusionloss_grad: L1 vs mask + weighted LapLoss2."""
    return l1(_y(mask), fused_y) + lap_weight * laplacian_pyramid_max_l1(
        fused_y, ir, vis)


def fusion_loss_mse_lap_ssim(ir, vis, fused_y, mask, lap_weight: float = 0.1,
                             ssim_weight: float = 1.1):
    """Fusionloss_grad2: L1 + LapLoss2 + SSIM terms."""
    target = _y(mask)
    return (l1(target, fused_y)
            + lap_weight * laplacian_pyramid_max_l1(fused_y, ir, vis)
            + ssim_weight * (1.0 - ssim(fused_y, target)))


def iqa_entropy_loss(fused_y, patch_size: int = 4) -> jnp.ndarray:
    """Negative normalized patch entropy (higher entropy = better quality),
    the quality term of IQALoss (loss.py:605-633 + core/Entropy.py)."""
    n, h, w, _ = fused_y.shape
    num_patches = (h // patch_size) * (w // patch_size) * n
    return -patch_entropy(fused_y, patch_size=patch_size) / num_patches
