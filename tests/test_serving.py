"""Serving surface: AOT closure, StableHLO export round-trip, export CLI.

The artifact must be loadable with ONLY jax (no segmif_tpu / flax) and
reproduce the direct model.apply outputs bit-exactly on the same platform.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmif_tpu import serving
from segmif_tpu.models.network import JointPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    model = JointPipeline("mit_b0", num_classes=9)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
    vis = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    variables = model.init(rng, ir, vis)
    return model, variables, ir, vis


def test_serving_fn_matches_apply(tiny_pipeline):
    model, variables, ir, vis = tiny_pipeline
    serve = serving.make_serving_fn(model, variables)
    fused_rgb, pred = serve(ir, vis)
    ref_rgb, _, ref_logits = model.apply(variables, ir, vis)
    np.testing.assert_allclose(np.asarray(fused_rgb), np.asarray(ref_rgb),
                               rtol=1e-4, atol=1e-4)
    assert pred.shape == (1, 32, 32)
    assert pred.dtype == jnp.int32


@pytest.mark.slow  # extra guide-taps compile: ~40 s
def test_serving_fn_baked_guide_taps(tiny_pipeline):
    model, variables, ir, vis = tiny_pipeline
    guide = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
    serve = serving.make_serving_fn(model, variables, guide_rgb=guide)
    fused_rgb, _ = serve(ir, vis)
    # reference semantics: taps from the static guide, not from vis
    taps = serving.precompute_guide_taps(model, variables, guide)
    ref_rgb, _, _ = model.apply(variables, ir, vis, taps=taps)
    np.testing.assert_allclose(np.asarray(fused_rgb), np.asarray(ref_rgb),
                               rtol=1e-4, atol=1e-4)
    # and different from the vis-guided output
    vis_rgb, _, _ = model.apply(variables, ir, vis)
    assert not np.allclose(np.asarray(fused_rgb), np.asarray(vis_rgb))


@pytest.mark.slow  # export lowering: ~35 s
def test_export_roundtrip(tmp_path, tiny_pipeline):
    model, variables, ir, vis = tiny_pipeline
    data = serving.export_serving_artifact(model, variables, 1, 32, 32)
    path = tmp_path / "serve.stablehlo"
    serving.save_serving_artifact(path, data)

    fn = serving.load_serving_artifact(path)
    fused_rgb, pred = fn(ir, vis)
    serve = serving.make_serving_fn(model, variables)
    ref_rgb, ref_pred = serve(ir, vis)
    np.testing.assert_allclose(np.asarray(fused_rgb), np.asarray(ref_rgb),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref_pred))

    specs = serving.serving_input_specs(path)
    assert specs == (((1, 32, 32, 1), "float32"), ((1, 32, 32, 3), "float32"))


@pytest.mark.slow
def test_export_multiplatform_lowering(tmp_path, tiny_pipeline):
    """Lowering for TPU must not require TPU hardware; the cpu entry in the
    same artifact still executes here."""
    model, variables, ir, vis = tiny_pipeline
    data = serving.export_serving_artifact(model, variables, 1, 32, 32,
                                           platforms=("tpu", "cpu"))
    path = tmp_path / "serve_multi.stablehlo"
    serving.save_serving_artifact(path, data)
    fn = serving.load_serving_artifact(path)
    fused_rgb, pred = fn(ir, vis)
    assert fused_rgb.shape == (1, 32, 32, 3)
    assert pred.shape == (1, 32, 32)


@pytest.mark.slow
def test_export_cli(tmp_path):
    from segmif_tpu.cli.export import main as export_main

    out = tmp_path / "cli_artifact.stablehlo"
    export_main(["--out", str(out), "--backbone", "mit_b0",
                 "--batch", "1", "--height", "32", "--width", "32"])
    assert out.exists() and out.stat().st_size > 0
    fn = serving.load_serving_artifact(out)
    ir = jnp.zeros((1, 32, 32, 1), jnp.float32)
    vis = jnp.zeros((1, 32, 32, 3), jnp.float32)
    fused_rgb, pred = fn(ir, vis)
    assert fused_rgb.shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_multiplatform_export_with_pallas_capable_shapes(tmp_path):
    """Regression: a tpu+cpu export must not bake the Pallas sr-attention
    kernel into the CPU lowering ("Only interpret mode is supported on CPU
    backend"). The serving exporter traces multi-platform artifacts with
    the XLA attention path (serving.py::export_serving_artifact); the
    shapes here are inside the kernel's supports() regime so the bug path
    is actually exercised."""
    import jax.numpy as jnp

    from segmif_tpu.kernels.pallas_attention import supports
    from segmif_tpu.models.network import JointPipeline
    from segmif_tpu.serving import (export_serving_artifact,
                                    load_serving_artifact,
                                    save_serving_artifact)

    b, h, w = 1, 64, 64
    # stage-1 tokens at h/4: [1, 256, 1, 32] q vs reduced kv -> in-regime
    assert supports((b, (h // 4) * (w // 4), 1, 32), (b, 4, 1, 32))
    model = JointPipeline("mit_b0", num_classes=9, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ir = jnp.zeros((1, h, w, 1), jnp.float32)
    vis = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(rng, ir, vis)
    data = export_serving_artifact(model, variables, b, h, w,
                                   platforms=("tpu", "cpu"))
    p = tmp_path / "art.stablehlo"
    save_serving_artifact(p, data)
    fn = load_serving_artifact(p)
    fused_rgb, pred = fn(ir, vis)
    assert fused_rgb.shape == (1, h, w, 3) and pred.shape == (1, h, w)


@pytest.mark.slow  # calibrate+quantize compiles
def test_serving_fn_int8_calibration(tiny_pipeline):
    """int8_calibration quantizes the DRDB path: the serving closure still
    produces a fused image close to the f32 one (quantization-noise bound)
    and an int32 class map; the quantized weights ride inside the closure."""
    model, variables, ir, vis = tiny_pipeline
    serve = serving.make_serving_fn(model, variables,
                                    int8_calibration=(ir, vis))
    fused_rgb, pred = serve(ir, vis)
    ref_rgb, _, _ = model.apply(variables, ir, vis)
    d = np.asarray(fused_rgb) - np.asarray(ref_rgb)
    assert float(np.sqrt((d ** 2).mean())) < 0.15, (
        f"int8 serving fused-RGB rmse {float(np.sqrt((d**2).mean())):.4f}")
    assert pred.dtype == jnp.int32


@pytest.mark.slow
def test_export_roundtrip_int8(tiny_pipeline, tmp_path):
    """The int8-quantized closure exports to StableHLO and reproduces the
    in-process int8 outputs bit-exactly on the same platform."""
    model, variables, ir, vis = tiny_pipeline
    serve = serving.make_serving_fn(model, variables,
                                    int8_calibration=(ir, vis))
    ref_rgb, ref_pred = serve(ir, vis)
    data = serving.export_serving_artifact(
        model, variables, 1, 32, 32, int8_calibration=(ir, vis))
    path = tmp_path / "art_int8.stablehlo"
    serving.save_serving_artifact(path, data)
    call = serving.load_serving_artifact(path)
    got_rgb, got_pred = call(ir, vis)
    np.testing.assert_array_equal(np.asarray(got_pred), np.asarray(ref_pred))
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(ref_rgb),
                               atol=1e-6)
