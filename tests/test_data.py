import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmif_tpu.data import (
    AugConfig,
    Prefetcher,
    SyntheticFusionDataset,
    augment_batch,
    augment_sample,
    iterate_eval,
    photometric_distortion,
)

KEY = jax.random.PRNGKey(0)


def _sample(size=(48, 64)):
    ds = SyntheticFusionDataset(n=2, size=size)
    _, ir, vis, guide, label = ds[0]
    return (jnp.asarray(ir), jnp.asarray(vis), jnp.asarray(guide),
            jnp.asarray(label))


def test_augment_sample_shapes():
    cfg = AugConfig(crop_size=32)
    ir, vis, guide, label = _sample()
    out = augment_sample(KEY, ir, vis, guide, label, cfg, 9)
    assert out["ir"].shape == (32, 32, 1)
    assert out["vis"].shape == (32, 32, 3)
    assert out["guide"].shape == (32, 32, 3)
    assert out["label"].shape == (32, 32)
    assert out["label"].dtype == jnp.int32
    assert float(out["vis"].max()) <= 1.0 + 1e-6
    assert float(out["vis"].min()) >= 0.0


def test_augment_deterministic_per_key():
    cfg = AugConfig(crop_size=32)
    ir, vis, guide, label = _sample()
    a = augment_sample(KEY, ir, vis, guide, label, cfg, 9)
    b = augment_sample(KEY, ir, vis, guide, label, cfg, 9)
    np.testing.assert_array_equal(np.asarray(a["vis"]), np.asarray(b["vis"]))
    c = augment_sample(jax.random.PRNGKey(7), ir, vis, guide, label, cfg, 9)
    assert not np.array_equal(np.asarray(a["vis"]), np.asarray(c["vis"]))


def test_augment_identity_when_no_aug():
    """scale=1, no flip, no photometric -> crop is a plain window."""
    cfg = AugConfig(crop_size=32, scale_min=1.0, scale_max=1.0, flip_prob=0.0,
                    brightness_delta=0.0, contrast_range=(1.0, 1.0),
                    saturation_range=(1.0, 1.0), hue_delta=0.0)
    ir, vis, guide, label = _sample()
    out = augment_sample(KEY, ir, vis, guide, label, cfg, 9)
    crop = np.asarray(out["label"])
    full = np.asarray(label)
    # the crop must appear verbatim somewhere in the source label map
    found = False
    for oh in range(full.shape[0] - 32 + 1):
        for ow in range(full.shape[1] - 32 + 1):
            if np.array_equal(full[oh:oh + 32, ow:ow + 32], crop):
                found = True
                break
        if found:
            break
    assert found


def test_augment_batch_vmap():
    cfg = AugConfig(crop_size=16)
    ds = SyntheticFusionDataset(n=4, size=(32, 48))
    batch = [ds[i] for i in range(4)]
    ir = jnp.stack([b[1] for b in batch])
    vis = jnp.stack([b[2] for b in batch])
    guide = jnp.stack([b[3] for b in batch])
    label = jnp.stack([b[4] for b in batch])
    out = augment_batch(KEY, ir, vis, guide, label, cfg, 9)
    assert out["vis"].shape == (4, 16, 16, 3)
    assert out["label"].shape == (4, 16, 16)


def test_photometric_identity_ranges():
    cfg = AugConfig(brightness_delta=0.0, contrast_range=(1.0, 1.0),
                    saturation_range=(1.0, 1.0), hue_delta=0.0)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (16, 16, 3)).astype(np.float32))
    out = photometric_distortion(KEY, img, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-2)


def test_hsv_roundtrip():
    from segmif_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.uniform(0, 255, (8, 8, 3)).astype(np.float32))
    h, s, v = _rgb_to_hsv(rgb)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-2)


def test_prefetcher_batches():
    ds = SyntheticFusionDataset(n=6, size=(24, 32))
    pf = Prefetcher(ds, batch_size=2, num_threads=2, prefetch_depth=2)
    it = iter(pf)
    for _ in range(4):
        b = next(it)
        assert b["ir"].shape == (2, 24, 32, 3)
        assert b["label"].shape == (2, 24, 32)
        assert b["label"].dtype == np.int32
    pf.close()


def test_prefetcher_start_batch_fast_forward():
    """Batch k of a start_batch=k Prefetcher equals batch k of a fresh one
    with the same seed (the mid-phase training-resume contract), across an
    epoch boundary (6 samples / batch 2 = 3 batches per epoch)."""
    ds = SyntheticFusionDataset(n=6, size=(8, 8))
    pf = Prefetcher(ds, batch_size=2, seed=7, num_threads=1,
                    use_native=False)
    ref = [next(iter_) for iter_ in [iter(pf)] for _ in range(5)]
    pf.close()
    for k in (1, 3, 4):  # 3 and 4 cross the epoch boundary
        pfk = Prefetcher(ds, batch_size=2, seed=7, num_threads=1,
                         use_native=False, start_batch=k)
        got = next(iter(pfk))
        pfk.close()
        np.testing.assert_array_equal(got["ir"], ref[k]["ir"])
        np.testing.assert_array_equal(got["label"], ref[k]["label"])


def test_iterate_eval_partial_batch():
    ds = SyntheticFusionDataset(n=3, size=(16, 16))
    batches = list(iterate_eval(ds, batch_size=2))
    assert len(batches) == 2
    names, count, arrays = batches[-1]
    assert count == 1 and len(names) == 1
    assert arrays[0].shape[0] == 2  # padded


def test_synthetic_dataset_deterministic():
    ds = SyntheticFusionDataset(n=2, size=(16, 16))
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a[1], b[1])
    assert a[4].min() >= 0 and a[4].max() < 9


def test_voc_seg_dataset(tmp_path):
    """Working classic-VOC layout loader (reference datasets/voc.py is
    broken as shipped — __init__ typo'd, SURVEY.md 2.8)."""
    from PIL import Image

    from segmif_tpu.data.datasets import VOCSegDataset

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "SegmentationClassAug").mkdir()
    rng = np.random.default_rng(0)
    for n in ("a1", "a2"):
        img = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / "JPEGImages" / f"{n}.jpg")
        lab = np.zeros((20, 24), np.uint8)
        lab[:5] = 3
        lab[5:8] = 255  # ignore region
        Image.fromarray(lab).save(tmp_path / "SegmentationClassAug" / f"{n}.png")
    (tmp_path / "train.txt").write_text("a1\na2\n")

    ds = VOCSegDataset(tmp_path, split="train")
    assert len(ds) == 2
    n, img, lab = ds[0]
    assert n == "a1" and img.shape == (20, 24, 3) and lab.shape == (20, 24)
    assert set(np.unique(lab)) == {0, 3, 255}
    onehot = ds.class_labels(0, num_classes=21)
    assert onehot[3] == 1 and onehot.sum() == 2  # classes {0, 3}; 255 dropped

    ds_test = VOCSegDataset(tmp_path, split="train", stage="test")
    _, img2, lab2 = ds_test[0]
    assert lab2.shape == img2.shape[:2]  # placeholder label, no mask read


def test_mfnet_dataset(tmp_path):
    """MFNet split loader: names from <split>.txt, RGBT image split into
    vis/ir, bilinear image + nearest label resize to the eval size
    (util/MF_dataset.py:9-47)."""
    from PIL import Image

    from segmif_tpu.data.datasets import MFNetDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (10, 12, 4), dtype=np.uint8)  # RGBT
    Image.fromarray(img).save(tmp_path / "images" / "d1.png")
    lab = rng.integers(0, 9, (10, 12), dtype=np.uint8)
    Image.fromarray(lab).save(tmp_path / "labels" / "d1.png")
    (tmp_path / "test_day.txt").write_text("d1\n")

    ds = MFNetDataset(tmp_path, split="test_day", size=(20, 24))
    assert len(ds) == 1
    n, ir, vis, label = ds[0]
    assert ir.shape == (20, 24, 1) and vis.shape == (20, 24, 3)
    assert label.shape == (20, 24) and label.dtype == np.int32
    assert set(np.unique(label)).issubset(set(np.unique(lab)))  # nearest
