from .fusion import (
    DRDB,
    AttentionModule,
    CrossPath,
    FeatureFusionModule,
    FusionNetwork,
    SimpleFusionNetwork,
)
from .mit import MIT_VARIANTS, MiTConfig, MixVisionTransformer, fusion_taps
from .network import JointPipeline, SegmentationNetwork, SegModel
from .segformer_head import SegFormerHead

__all__ = [
    "DRDB", "AttentionModule", "CrossPath", "FeatureFusionModule", "FusionNetwork",
    "SimpleFusionNetwork", "MIT_VARIANTS", "MiTConfig", "MixVisionTransformer",
    "fusion_taps", "JointPipeline", "SegmentationNetwork", "SegModel",
    "SegFormerHead",
]
