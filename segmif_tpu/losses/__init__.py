from .dwa import DWAState, dwa_combine, dwa_init
from .fusion_losses import (
    fusion_loss_l1_grad,
    fusion_loss_l1_lap,
    fusion_loss_mask_l1,
    fusion_loss_max_grad,
    fusion_loss_mse_lap_ssim,
    fusion_loss_mse_ssim,
    iqa_entropy_loss,
    laplacian_pyramid_l1,
    laplacian_pyramid_max_l1,
)
from .seg_loss import cross_entropy, focal_loss, ohem_cross_entropy

__all__ = [
    "DWAState", "dwa_combine", "dwa_init",
    "fusion_loss_l1_grad", "fusion_loss_l1_lap", "fusion_loss_mask_l1",
    "fusion_loss_max_grad", "fusion_loss_mse_lap_ssim", "fusion_loss_mse_ssim",
    "iqa_entropy_loss", "laplacian_pyramid_l1", "laplacian_pyramid_max_l1",
    "cross_entropy", "focal_loss", "ohem_cross_entropy",
]
