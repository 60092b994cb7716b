"""Serving: AOT-compiled inference closures and portable StableHLO export.

The reference has no deployment story: inference is an interpreted
per-image Python loop that reloads checkpoints and recomputes the static
guide's encoder features for every pair (/root/reference/test_fusion.py:
100-126, val_performance.py:82-126). This module is the TPU-native
production surface:

 - ``make_serving_fn``: one jitted closure ``(ir, vis) -> (fused_rgb,
   pred)`` with the guide's seg-encoder taps precomputed and baked in as
   XLA constants (the taps come from a STATIC per-dataset guide image, so
   at inference they are constants, not per-pair work — this removes one
   full encoder pass from the hot path).
 - ``export_serving_artifact`` / ``load_serving_artifact``: ``jax.export``
   serialization of that closure to a self-contained StableHLO artifact
   (weights baked in as module constants), optionally lowered for several
   platforms at once (``("tpu", "cpu")``) so the same artifact file runs on
   a TPU server and on a CPU smoke box. Loading needs only jax — not this
   package, not flax, not the checkpoint files.

Everything is static-shape by design: a serving deployment picks (batch,
height, width) at export time, which is exactly what XLA:TPU wants.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def precompute_guide_taps(model, variables, guide_rgb: jnp.ndarray):
    """Run the seg encoder ONCE on the static guide image.

    Returns the (tap1, tap2) feature maps as concrete device arrays at the
    encoder stages' native resolution (16x/64x smaller than the reference's
    full-res forward_fusion taps; the fusion net upsamples them into its
    trunk layout itself), ready to pass as ``taps=`` to the pipeline
    (reference recomputes these per image: test_fusion.py:100)."""
    fn = jax.jit(
        lambda v, g: model.apply(v, g, method=type(model).guide_taps_raw))
    return fn(variables, guide_rgb)


def quantize_for_serving(model, variables, calibration_pairs,
                         guide_rgb: Optional[jnp.ndarray] = None,
                         vis_channel: str = "r"):
    """Calibrate + enable the int8 DRDB path (kernels/int8.py).

    calibration_pairs: ``(ir, vis)`` arrays of representative inputs (one
    batch is enough — the scales are per-tensor abs-maxes). Returns
    ``(model_int8, variables_with_quant_collection)``: the model clone runs
    the fusion DRDBs as calibrated int8 convs (measured 2x the bf16 MXU
    conv rate on v5e, experiments/e20_int8_drdb.py); accuracy cost is
    recorded by accuracy.py --drift_int8."""
    ir_cal, vis_cal = calibration_pairs
    model_cal = model.clone(quant="calibrate", parent=None)
    variables_cal = model_cal.init(
        jax.random.PRNGKey(0), ir_cal[:1], vis_cal[:1])
    seed = {k: v for k, v in variables.items()}
    seed["quant"] = variables_cal["quant"]
    _, upd = model_cal.apply(seed, ir_cal, vis_cal, taps=None,
                             vis_channel=vis_channel,
                             guide_rgb=guide_rgb, mutable=["quant"])
    out_vars = {k: v for k, v in variables.items()}
    out_vars["quant"] = upd["quant"]
    return model.clone(quant="int8", parent=None), out_vars


def make_serving_fn(model, variables, guide_rgb: Optional[jnp.ndarray] = None,
                    with_seg: bool = True, vis_channel: str = "r",
                    int8_calibration=None):
    """Build the jitted serving closure ``(ir, vis) -> outputs``.

    ir: [B,H,W,1] float32 in [0,1]; vis: [B,H,W,3] float32 in [0,1].
    Outputs: ``(fused_rgb, pred)`` where pred is the int32 class map at
    full resolution, or just ``fused_rgb`` when ``with_seg=False``.

    When ``guide_rgb`` is given, its taps are computed now and captured as
    closure constants; otherwise the guide defaults to the VIS frame per
    pair (the reference's val_fusion behavior when no Mask2 guide exists).

    ``int8_calibration=(ir_cal, vis_cal)`` quantizes the fusion DRDBs to
    calibrated int8 first (see quantize_for_serving).
    """
    if int8_calibration is not None:
        model, variables = quantize_for_serving(
            model, variables, int8_calibration, guide_rgb, vis_channel)
    taps = None
    if guide_rgb is not None:
        taps = precompute_guide_taps(model, variables, guide_rgb)

    @jax.jit
    def serve(ir, vis):
        fused_rgb, _fused_y, logits = model.apply(
            variables, ir, vis, taps=taps, vis_channel=vis_channel)
        if not with_seg:
            return fused_rgb
        # 1/4-res logits -> full-res class map (Network3._loss upsampling
        # semantics, reference core/model_fusion.py:1090-1097)
        logits = jax.image.resize(
            logits.astype(jnp.float32),
            (logits.shape[0], ir.shape[1], ir.shape[2], logits.shape[3]),
            "bilinear")
        return fused_rgb, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return serve


def export_serving_artifact(model, variables, batch: int, height: int,
                            width: int,
                            guide_rgb: Optional[jnp.ndarray] = None,
                            with_seg: bool = True,
                            vis_channel: str = "r",
                            platforms: Optional[Sequence[str]] = None,
                            int8_calibration=None) -> bytes:
    """Lower + serialize the serving closure to portable StableHLO bytes.

    Weights (and precomputed guide taps) are baked into the module as
    constants — the artifact is self-contained. ``platforms`` lowers for
    several backends in one artifact (e.g. ``("tpu", "cpu")``); lowering
    for TPU does NOT require TPU hardware. ``int8_calibration=(ir, vis)``
    bakes the calibrated int8 DRDB path (weights ship as int8 module
    constants + scales — the artifact itself carries the quantization).
    """
    serve = make_serving_fn(model, variables, guide_rgb=guide_rgb,
                            with_seg=with_seg, vis_channel=vis_channel,
                            int8_calibration=int8_calibration)
    ir_spec = jax.ShapeDtypeStruct((batch, height, width, 1), jnp.float32)
    vis_spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.float32)
    # The Pallas sr-attention kernel only lowers for TPU. Its dispatch is
    # staged with lax.platform_dependent, but jax.export lowers EVERY
    # branch for EVERY requested platform (measured: a tpu,cpu export
    # raises "Only interpret mode is supported on CPU backend" from the
    # kernel's CPU lowering rule), so any artifact that must run off-TPU
    # is traced with the XLA attention path instead — portability over
    # the kernel (a tpu-only artifact keeps it).
    disable_pallas = platforms is not None and set(platforms) != {"tpu"}
    env_ctx = {}
    if disable_pallas:
        env_ctx["SEGMIF_DISABLE_PALLAS"] = os.environ.get(
            "SEGMIF_DISABLE_PALLAS")
        os.environ["SEGMIF_DISABLE_PALLAS"] = "1"
    try:
        exported = jax_export.export(
            serve, platforms=list(platforms) if platforms else None)(
                ir_spec, vis_spec)
    finally:
        for k, old in env_ctx.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
    return exported.serialize()


def save_serving_artifact(path: str | Path, data: bytes) -> None:
    Path(path).write_bytes(data)


def load_serving_artifact(path: str | Path):
    """Deserialize an artifact; returns a callable ``(ir, vis) -> outputs``.

    The callable is jit-compatible and runs on whatever platform jax is
    currently using, provided it was in the artifact's platform list.
    """
    exported = jax_export.deserialize(bytearray(Path(path).read_bytes()))
    return exported.call


def serving_input_specs(artifact_path: str | Path
                        ) -> Tuple[Tuple[Tuple[int, ...], str], ...]:
    """Inspect an artifact's expected input shapes/dtypes without running it."""
    exported = jax_export.deserialize(
        bytearray(Path(artifact_path).read_bytes()))
    return tuple((tuple(a.shape), str(a.dtype))
                 for a in exported.in_avals)
