"""segmif_tpu: TPU-native joint IR-visible image fusion + semantic segmentation.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of
JinyuanLiu-CV/SegMiF (ICCV 2023): a dense-residual fusion network with
hierarchical interactive attention, a SegFormer (MiT) segmentation branch,
joint interactive training with dynamic task weighting, and the FMB/MFNet
evaluation protocol — designed SPMD-first for TPU meshes.
"""

__version__ = "0.1.0"
