import numpy as np
import jax
import jax.numpy as jnp

from segmif_tpu.config import TrainConfig, load_yaml
from segmif_tpu.data.legacy_augment import (
    random_brightness,
    random_crop,
    random_crop_out,
    random_flip,
    random_noise,
)
from segmif_tpu.losses.detection import (
    box_iou,
    centerness_bce_loss,
    giou_loss,
    iou_loss,
    sigmoid_focal_loss,
)
from segmif_tpu.ops.color import mean_recombine
from segmif_tpu.utils.logging import eta, setup_logger
from segmif_tpu.utils.profiler import StepTimer

KEY = jax.random.PRNGKey(0)


def test_box_iou_known():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    np.testing.assert_allclose(np.asarray(box_iou(a, b)), [1.0 / 7.0],
                               atol=1e-6)
    assert float(iou_loss(a, a)) < 1e-5
    assert float(giou_loss(a, a)) < 1e-5
    # disjoint boxes: giou < iou penalty
    c = jnp.array([[5.0, 5.0, 6.0, 6.0]])
    assert float(giou_loss(a, c)) > 1.0


def test_sigmoid_focal_loss_behavior():
    logits = jnp.array([10.0, -10.0])
    targets = jnp.array([1.0, 0.0])
    good = float(sigmoid_focal_loss(logits, targets))
    bad = float(sigmoid_focal_loss(-logits, targets))
    assert good < 1e-3 < bad


def test_centerness_bce_mask():
    logits = jnp.zeros((4,))
    targets = jnp.array([1.0, 0.0, 0.5, 0.5])
    mask = jnp.array([True, True, False, False])
    val = float(centerness_bce_loss(logits, targets, mask))
    assert abs(val - np.log(2.0)) < 1e-5  # BCE(0 logits) = log 2


def test_mean_recombine_range(rng):
    vis = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32))
    out = mean_recombine(mask, vis)
    assert out.shape == (1, 8, 8, 3)
    assert abs(float(jnp.min(out))) < 1e-5
    assert abs(float(jnp.max(out)) - 1.0) < 1e-5


def test_legacy_augs_shapes(rng):
    img = jnp.asarray(rng.uniform(0, 255, (16, 20, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 9, (16, 20)).astype(np.int32))
    for fn in (random_flip, random_crop, random_crop_out, random_brightness,
               random_noise):
        i2, l2 = fn(KEY, img, lab)
        assert i2.shape == img.shape
        assert l2.shape == lab.shape
    i2, _ = random_brightness(KEY, img, lab)
    assert float(jnp.max(i2)) <= 255.0


def test_config_yaml_roundtrip(tmp_path):
    seg = tmp_path / "seg.yaml"
    fus = tmp_path / "fus.yaml"
    seg.write_text("""
exp: {backbone: mit_b2}
dataset: {num_classes: 15, crop_size: 480}
optimizer: {learning_rate: 8e-5, weight_decay: 0.01}
scheduler: {warmup_iter: 3000, warmup_ratio: 1e-6, power: 1.0}
train: {samples_per_gpu: 4, max_iters: 160000, log_iters: 50}
""")
    fus.write_text("""
dataset: {crop_size: 320}
train: {samples_per_gpu: 4, max_iters: 20000}
scheduler: {warmup_ratio: 1e-4}
""")
    cfg = load_yaml(seg, fus)
    assert cfg.backbone == "mit_b2"
    assert cfg.data.num_classes == 15
    assert cfg.optimizer.warmup_iter == 3000
    assert cfg.optimizer.max_iters == 160000
    assert cfg.fusion.crop_size == 320
    assert cfg.fusion.batch_size == 2  # samples_per_gpu // 2
    assert cfg.seg.batch_size == 4


def test_repo_configs_load():
    cfg = load_yaml("configs/fmb.yaml", "configs/fmb_fusion.yaml")
    assert cfg.backbone == "mit_b3"
    assert cfg.data.num_classes == 15


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.mean > 0


def test_eta_no_crash_at_zero():
    import datetime

    el, rem = eta(datetime.datetime.now(), 0, 100)
    assert isinstance(el, str) and isinstance(rem, str)


def test_fusion_attention_maps():
    from segmif_tpu.models.fusion import FusionNetwork

    m = FusionNetwork(channels=16, num_heads=4, return_attention=True)
    ir = jnp.ones((1, 8, 8, 1))
    t1 = jnp.ones((1, 8, 8, 4))
    t2 = jnp.ones((1, 8, 8, 6))
    p = m.init(KEY, ir, ir, t1, t2)
    y, maps = jax.jit(m.apply)(p, ir, ir, t1, t2)
    assert y.shape == (1, 8, 8, 1)
    assert len(maps) == 2  # one context per interaction round
    # same params usable without attention outputs
    m2 = FusionNetwork(channels=16, num_heads=4)
    y2 = jax.jit(m2.apply)(p, ir, ir, t1, t2)
    # the non-context path folds the end projections into the context
    # matrices (same math, different fp association) — tolerance covers it
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_legacy_flipud_rot():
    import jax
    import jax.numpy as jnp

    from segmif_tpu.data.legacy_augment import random_flipud, random_rot

    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    lab = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)
    # flipud with prob 1 flips rows
    fi, fl = random_flipud(jax.random.PRNGKey(0), img, lab, prob=1.0)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[::-1])
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(lab)[::-1])
    # rot: image and label rotate by the SAME k in {1,2,3}, jittable
    ri, rl = jax.jit(random_rot)(jax.random.PRNGKey(3), img, lab)
    matches = [k for k in (1, 2, 3)
               if np.array_equal(np.asarray(ri), np.rot90(np.asarray(img), k))
               and np.array_equal(np.asarray(rl),
                                  np.rot90(np.asarray(lab), k))]
    assert len(matches) == 1


def test_visual_colormap_and_grids():
    from segmif_tpu.eval.visual import (colormap, encode_cmap, make_grid,
                                        training_image_summary)

    cmap = colormap()
    assert cmap.shape == (256, 3) and cmap.dtype == np.uint8
    # VOC palette spot checks (class 1 = dark red, 2 = dark green)
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[2], [0, 128, 0])

    lab = np.array([[0, 1], [2, 3]])
    enc = encode_cmap(lab)
    np.testing.assert_array_equal(enc[0, 1], cmap[1])

    imgs = np.zeros((3, 4, 5, 3), np.uint8)
    grid = make_grid(imgs, nrow=2)
    assert grid.shape == (2 * (4 + 2) + 2, 2 * (5 + 2) + 2, 3)

    rng = np.random.default_rng(0)
    gi, gp, gl = training_image_summary(
        rng.uniform(0, 1, (2, 4, 4, 3)),
        rng.normal(size=(2, 4, 4, 9)),
        rng.integers(0, 9, (2, 4, 4)))
    assert gi.dtype == np.uint8 and gp is not None and gl is not None


def test_ab_bare_value_knob_raises(monkeypatch):
    """SEGMIF_AB=tail_max_plane without '=value' must raise, not silently
    collapse the strip cap to int(True) == 1 px (ADVICE r4)."""
    import pytest

    from segmif_tpu.utils.ab import ab

    monkeypatch.setenv("SEGMIF_AB", "tail_max_plane")
    with pytest.raises(ValueError, match="requires '=value'"):
        ab("tail_max_plane")
    monkeypatch.setenv("SEGMIF_AB", "phase_max_plane=28800")
    assert ab("phase_max_plane") == "28800"


def test_separable_filter_true_correlation_asymmetric():
    """separable_filter must apply the window as a CORRELATION (matching
    depthwise_conv2d / torch F.conv2d), including for asymmetric windows —
    the signed Sobel components must agree WITHOUT abs (ADVICE r4)."""
    import numpy as np

    import jax.numpy as jnp
    from segmif_tpu.ops.filters import depthwise_conv2d, separable_filter

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 12, 14, 1)).astype(np.float32))
    # signed sobel gx: [1,2,1]^T (x) [-1,0,1] as written in _SOBEL_X
    k2 = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    ref = depthwise_conv2d(x, k2, [(1, 1), (1, 1)])
    got = separable_filter(x, (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
