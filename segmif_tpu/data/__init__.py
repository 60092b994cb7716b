from .augment import AugConfig, augment_batch, augment_sample, photometric_distortion
from .datasets import (
    FusionFolderDataset,
    MethodFolderDataset,
    MFNetDataset,
    PairFolderDataset,
    SyntheticFusionDataset,
    VOCSegDataset,
)
from .pipeline import Prefetcher, iterate_eval

__all__ = [
    "AugConfig", "augment_batch", "augment_sample", "photometric_distortion",
    "FusionFolderDataset", "MethodFolderDataset", "MFNetDataset",
    "PairFolderDataset", "SyntheticFusionDataset", "VOCSegDataset",
    "Prefetcher",
    "iterate_eval",
]
