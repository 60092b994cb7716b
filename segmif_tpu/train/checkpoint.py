"""Checkpointing: Orbax save/restore + one-shot converter from reference
torch checkpoints.

Replaces torch.save/load of two fixed paths
(/root/reference/train.py:237-243,402-407). Two kinds of checkpoints exist:

 - role checkpoints (`fusion_params`, `seg_params`): params (+ batch_stats
   for seg) only — the serving/eval artifacts, mirroring the reference's
   two .pth files;
 - mid-phase checkpoints (`{role}_phase_r{N}`): the FULL train state
   ({params, batch_stats, opt_state, step, dwa buffer, best-mIoU gate}),
   written by InteractiveTrainer._save_phase so an interrupted phase
   resumes its exact trajectory.

`load_torch_*` converters map the reference's .pth key layout onto this
framework's param trees (needed for numerical-parity evals; the dead
`ffm2.*` params in the fusion checkpoint are dropped — see SURVEY.md §2.8).
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


# ---------------------------------------------------------------- orbax ----

def save_checkpoint(path: str | Path, tree: Any, force: bool = True) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def restore_checkpoint(path: str | Path, target: Any) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


# ------------------------------------------------------- torch converters ----

def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dwconv(w: np.ndarray) -> np.ndarray:
    """torch depthwise Conv2d [C,1,kh,kw] -> flax HWIO [kh,kw,1,C]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _load_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _set(tree: dict, path: list, value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_mit_encoder(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Torch MiT keys -> flax MixVisionTransformer param dict.

    Key layout: patch_embedN.{proj,norm}, blockN.<i>.{norm1,attn.*,norm2,
    mlp.*}, normN (/root/reference/core/mix_transformer.py:201-348)."""
    params: dict = {}
    for key, w in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        m = re.match(r"patch_embed(\d)\.(proj|norm)\.(weight|bias)", key)
        if m:
            stage, mod, kind = m.groups()
            if mod == "proj":
                val = _conv(w) if kind == "weight" else w
                name = "kernel" if kind == "weight" else "bias"
            else:
                val = w
                name = "scale" if kind == "weight" else "bias"
            _set(params, [f"patch_embed{stage}", mod, name], val)
            continue
        m = re.match(r"block(\d)\.(\d+)\.(.+)", key)
        if m:
            stage, idx, rest = m.groups()
            base = [f"block{stage}_{idx}"]
            if re.match(r"norm[12]\.(weight|bias)", rest):
                mod, kind = rest.split(".")
                _set(params, base + [mod, "scale" if kind == "weight" else "bias"], w)
            elif rest.startswith("attn."):
                sub = rest[len("attn."):]
                mod, kind = sub.rsplit(".", 1)
                if mod in ("q", "kv", "proj"):
                    val = _t(w) if kind == "weight" else w
                    name = "kernel" if kind == "weight" else "bias"
                elif mod == "sr":
                    val = _conv(w) if kind == "weight" else w
                    name = "kernel" if kind == "weight" else "bias"
                elif mod == "norm":
                    val = w
                    name = "scale" if kind == "weight" else "bias"
                else:
                    continue
                _set(params, base + ["attn", mod, name], val)
            elif rest.startswith("mlp."):
                sub = rest[len("mlp."):]
                if sub.startswith("dwconv.dwconv."):
                    kind = sub.rsplit(".", 1)[1]
                    val = _dwconv(w) if kind == "weight" else w
                    name = "kernel" if kind == "weight" else "bias"
                    _set(params, base + ["mlp", "dwconv", name], val)
                else:
                    mod, kind = sub.split(".")
                    val = _t(w) if kind == "weight" else w
                    name = "kernel" if kind == "weight" else "bias"
                    _set(params, base + ["mlp", mod, name], val)
            continue
        m = re.match(r"norm(\d)\.(weight|bias)", key)
        if m:
            stage, kind = m.groups()
            _set(params, [f"norm{stage}", "scale" if kind == "weight" else "bias"], w)
    return params


def convert_segformer_head(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Torch SegFormerHead keys -> (params, batch_stats)
    (/root/reference/core/segformer_head.py:27-57)."""
    params: dict = {}
    stats: dict = {}
    for key, w in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        m = re.match(r"linear_c(\d)\.proj\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            val = _t(w) if kind == "weight" else w
            _set(params, [f"linear_c{i}", "kernel" if kind == "weight" else "bias"], val)
            continue
        if key == "linear_fuse.conv.weight":
            _set(params, ["linear_fuse", "kernel"], _conv(w))
        elif key == "linear_fuse.bn.weight":
            _set(params, ["bn", "scale"], w)
        elif key == "linear_fuse.bn.bias":
            _set(params, ["bn", "bias"], w)
        elif key == "linear_fuse.bn.running_mean":
            _set(stats, ["bn", "mean"], w)
        elif key == "linear_fuse.bn.running_var":
            _set(stats, ["bn", "var"], w)
        elif key == "linear_pred.weight":
            _set(params, ["linear_pred", "kernel"], _conv(w))
        elif key == "linear_pred.bias":
            _set(params, ["linear_pred", "bias"], w)
    return params, stats


def load_torch_seg_network(path: str | Path):
    """Reference Network3 checkpoint (model-fusion_add_final2.pth) ->
    (params, batch_stats) for SegmentationNetwork.

    Torch layout: denoise_net.{encoder.*, decoder.*, classifier.weight}
    (/root/reference/core/model_fusion.py:9-68,1068-1104)."""
    sd = _load_state_dict(path)
    encoder = convert_mit_encoder(sd, "denoise_net.encoder.")
    head_params, head_stats = convert_segformer_head(sd, "denoise_net.decoder.")
    params = {"seg": {"encoder": encoder, "decoder": head_params}}
    if "denoise_net.classifier.weight" in sd:
        params["seg"]["classifier"] = {
            "kernel": _conv(sd["denoise_net.classifier.weight"])}
    stats = {"seg": {"decoder": head_stats}}
    return jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats)


def load_torch_mit_pretrained(path: str | Path):
    """Official mit_bN ImageNet checkpoint (pretrained/<backbone>.pth) ->
    encoder params; drops head.* as the reference does
    (/root/reference/core/model_fusion.py:22-26)."""
    sd = _load_state_dict(path)
    sd = {k: v for k, v in sd.items() if not k.startswith("head.")}
    return jax.tree.map(np.asarray, convert_mit_encoder(sd))


_DRDB_RE = re.compile(r"DRDB(\d)\.(Dcov(\d)|conv)\.(weight|bias)")


def load_torch_fusion_network(path: str | Path):
    """Reference Fusion_Network3_ac checkpoint (modelfusion-final2.pth) ->
    FusionNetwork params. Drops the dead ffm2.* weights
    (/root/reference/core/model_fusion.py:1039-1040)."""
    sd = _load_state_dict(path)
    params: dict = {}
    for key, w in sd.items():
        if key.startswith("ffm2."):
            continue  # constructed but never called in the reference
        if key == "relu.weight":
            _set(params, ["prelu_alpha"], w.reshape(1))
            continue
        m = _DRDB_RE.match(key)
        if m:
            n, mod, dcov_i, kind = m.groups()
            sub = f"dconv{dcov_i}" if dcov_i else "bottleneck"
            val = _conv(w) if kind == "weight" else w
            _set(params, [f"drdb{n}", sub, "kernel" if kind == "weight" else "bias"], val)
            continue
        m = re.match(r"(conv1_ir|conv1_vis|conv2|conv21|conv22|conv3|conv4)\.(weight|bias)", key)
        if m:
            mod, kind = m.groups()
            name = {"conv3": "seg_proj1", "conv4": "seg_proj2"}.get(mod, mod)
            val = _conv(w) if kind == "weight" else w
            _set(params, [name, "kernel" if kind == "weight" else "bias"], val)
            continue
        m = re.match(r"att(\d)\.conv\.([02])\.(weight|bias)", key)
        if m:  # Fusion_Network3_Average AttentionModules (:759-771)
            i, layer, kind = m.groups()
            sub = "conv_a" if layer == "0" else "conv_b"
            val = _conv(w) if kind == "weight" else w
            _set(params, [f"att{i}", sub,
                          "kernel" if kind == "weight" else "bias"], val)
            continue
        m = re.match(r"ffm\.cross\.(.+)", key)
        if m:
            rest = m.group(1)
            if re.match(r"channel_proj\d\.(weight|bias)", rest) or \
               re.match(r"end_proj\d\.(weight|bias)", rest):
                mod, kind = rest.split(".")
                val = _t(w) if kind == "weight" else w
                _set(params, ["ffm", "cross", mod,
                              "kernel" if kind == "weight" else "bias"], val)
            elif re.match(r"norm[12]\.(weight|bias)", rest):
                mod, kind = rest.split(".")
                _set(params, ["ffm", "cross", mod,
                              "scale" if kind == "weight" else "bias"], w)
            elif rest.startswith("cross_attn.kv3."):
                kind = rest.rsplit(".", 1)[1]
                val = _t(w) if kind == "weight" else w
                _set(params, ["ffm", "cross", "cross_attn", "kv_seg",
                              "kernel" if kind == "weight" else "bias"], val)
            elif rest.startswith("cross_attn2.kv"):
                m2 = re.match(r"cross_attn2\.(kv\d)\.(weight|bias)", rest)
                if m2:
                    mod, kind = m2.groups()
                    val = _t(w) if kind == "weight" else w
                    _set(params, ["ffm", "cross", "cross_attn2", mod,
                                  "kernel" if kind == "weight" else "bias"], val)
    return jax.tree.map(np.asarray, params)
