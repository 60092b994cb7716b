import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segmif_tpu.data import SyntheticFusionDataset
from segmif_tpu.eval.evaluator import (
    fusion_quality_eval,
    generate_fused,
    segmentation_eval,
)
from segmif_tpu.eval.image_io import fused_to_uint8, load_fused_dir, save_png
from segmif_tpu.models.network import JointPipeline
from segmif_tpu.train.steps import make_fuse_fn, make_segment_fn

KEY = jax.random.PRNGKey(0)


def _model_and_vars():
    model = JointPipeline(backbone="mit_b0", num_classes=9)
    variables = model.init(KEY, jnp.zeros((1, 32, 32, 1)),
                           jnp.zeros((1, 32, 32, 3)))
    return model, variables


@pytest.mark.slow  # end-to-end regenerate+eval: ~70 s CPU
def test_generate_fused_and_seg_eval(tmp_path):
    model, variables = _model_and_vars()
    ds = SyntheticFusionDataset(n=3, size=(32, 32))
    fuse_fn = jax.jit(make_fuse_fn(model))
    out_dir = tmp_path / "fused"
    names, fused, labels = generate_fused(fuse_fn, variables, ds,
                                          batch_size=2, out_dir=out_dir)
    assert len(names) == 3
    assert fused.shape == (3, 32, 32, 3)
    assert labels.shape == (3, 32, 32)
    assert sorted(p.name for p in out_dir.iterdir()) == sorted(names)

    segment_fn = jax.jit(make_segment_fn(model))
    res = segmentation_eval(segment_fn, variables, ds, 9, batch_size=2,
                            log_file=str(tmp_path / "log.txt"), tag="t")
    assert 0.0 <= res["mIoU"] <= 1.0
    assert res["confusion"].shape == (9, 9)
    assert (tmp_path / "log.txt").exists()


def test_fusion_quality_eval(rng):
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    res = fusion_quality_eval(a, a)
    assert res["ssim"] > 0.99
    assert res["mse"] < 1e-10


def test_fused_to_uint8_reference_quirk(rng):
    x = rng.uniform(0.2, 0.8, (1, 8, 8, 3)).astype(np.float32)
    ref = fused_to_uint8(x, quantize_like_reference=True)
    sane = fused_to_uint8(x, quantize_like_reference=False)
    assert ref.dtype == sane.dtype == np.uint8
    # both stretch to the full range
    assert ref.min() == 0 and ref.max() == 255
    assert sane.min() == 0 and sane.max() == 255


def test_save_and_load_png_roundtrip(tmp_path, rng):
    img = (rng.uniform(0, 255, (8, 8, 3))).astype(np.uint8)
    save_png(tmp_path / "d" / "x.png", img)
    loaded = load_fused_dir(tmp_path / "d")
    np.testing.assert_allclose(loaded[0], img.astype(np.float32) / 255.0,
                               atol=1e-6)
