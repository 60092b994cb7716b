from .augment import AugConfig, augment_batch, augment_sample, photometric_distortion
from .datasets import (
    FusionFolderDataset,
    MethodFolderDataset,
    MFNetDataset,
    PairFolderDataset,
    SyntheticFusionDataset,
)
from .pipeline import Prefetcher, iterate_eval

__all__ = [
    "AugConfig", "augment_batch", "augment_sample", "photometric_distortion",
    "FusionFolderDataset", "MethodFolderDataset", "MFNetDataset",
    "PairFolderDataset", "SyntheticFusionDataset", "Prefetcher",
    "iterate_eval",
]
