"""Import the ACTUAL reference modules from /root/reference/core for golden
parity testing.

Two obstacles, both worked around here without modifying the reference:
 - /root/reference/core/__init__.py:4 imports a nonexistent `Network`, so
   `import core` raises; we register a synthetic package whose __path__
   points at the directory and never execute the broken __init__.
 - timm / mmcv are not installed; the reference only uses
   timm.models.layers.{DropPath,to_2tuple,trunc_normal_} and
   mmcv.cnn.ConvModule, so minimal behavioral stubs (matching the public
   semantics AND the state_dict key layout: ConvModule.conv / .bn) are
   injected into sys.modules before loading.
"""
from __future__ import annotations

import collections.abc
import importlib
import sys
import types

REFERENCE_CORE = "/root/reference/core"


def _install_stubs():
    if "timm" in sys.modules and "mmcv" in sys.modules:
        return
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        # init-only: parity tests export whatever weights result, so a
        # clamped normal is behaviorally sufficient
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype,
                                                 device=x.device))
            return x.div(keep) * mask

    class ConvModule(nn.Module):
        """conv -> BN -> ReLU with mmcv's submodule names (state_dict keys
        `conv.*`, `bn.*` — what the checkpoint converter expects)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, norm_cfg=None,
                     act_cfg="relu", **kwargs):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride, padding, dilation, groups,
                                  bias=norm_cfg is None)
            self.bn = (nn.BatchNorm2d(out_channels)
                       if norm_cfg is not None else None)
            self.activate = nn.ReLU(inplace=True) if act_cfg else None

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            if self.activate is not None:
                x = self.activate(x)
            return x

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers

    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.DepthwiseSeparableConvModule = ConvModule  # imported, unused
    mmcv.cnn = mmcv_cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = mmcv_cnn


def load_reference_core():
    """Returns (mix_transformer, model_fusion, segformer_head) modules loaded
    from /root/reference/core, bypassing the broken core/__init__.py."""
    _install_stubs()
    if "refcore" not in sys.modules:
        pkg = types.ModuleType("refcore")
        pkg.__path__ = [REFERENCE_CORE]
        sys.modules["refcore"] = pkg
    mt = importlib.import_module("refcore.mix_transformer")
    mf = importlib.import_module("refcore.model_fusion")
    sh = importlib.import_module("refcore.segformer_head")
    return mt, mf, sh


def load_reference_loss():
    """Returns the ACTUAL /root/reference/core/loss.py module (GenTargets +
    loss family). Its `from lap_loss import ...` / `from pytorch_ssim
    import ...` absolute imports resolve against the reference root."""
    _install_stubs()
    if "refcore" not in sys.modules:
        pkg = types.ModuleType("refcore")
        pkg.__path__ = [REFERENCE_CORE]
        sys.modules["refcore"] = pkg
    ref_root = REFERENCE_CORE.rsplit("/", 1)[0]
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    return importlib.import_module("refcore.loss")
