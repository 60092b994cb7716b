from .color import (
    minmax_stretch,
    recombine_fused,
    rgb_to_ycrcb,
    ycrcb_to_rgb,
)
from .entropy import patch_entropy
from .filters import (
    depthwise_conv2d,
    gaussian_blur,
    gaussian_kernel_1d,
    gaussian_kernel_2d_grid,
    sobel_magnitude,
    unsharp_pyramid,
)
from .image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_imagenet,
    pad_to,
    resize_bilinear,
    resize_nearest,
)
from .ssim import ssim

__all__ = [
    "minmax_stretch", "recombine_fused", "rgb_to_ycrcb", "ycrcb_to_rgb",
    "patch_entropy", "depthwise_conv2d", "gaussian_blur", "gaussian_kernel_1d",
    "gaussian_kernel_2d_grid", "sobel_magnitude", "unsharp_pyramid",
    "IMAGENET_MEAN", "IMAGENET_STD", "normalize_imagenet", "pad_to",
    "resize_bilinear", "resize_nearest", "ssim",
]
