"""Native C++ data-loading runtime: decode parity with PIL, resize parity
with jax.image, threaded batch loader."""
import numpy as np
import pytest

from segmif_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native runtime unavailable")


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        p = d / f"rgb_{i}.png"
        Image.fromarray(rgb).save(p)
        paths.append((p, rgb))
    gray = rng.integers(0, 255, (24, 32), dtype=np.uint8)
    gp = d / "gray.png"
    Image.fromarray(gray).save(gp)
    jp = d / "photo.jpg"
    Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)).save(
        jp, quality=95)
    return d, paths, (gp, gray), jp


def test_decode_png_exact(png_dir):
    _, paths, _, _ = png_dir
    for p, rgb in paths:
        out = native.decode_image(p)
        np.testing.assert_array_equal(out.astype(np.uint8), rgb)


def test_decode_gray_expands_channels(png_dir):
    _, _, (gp, gray), _ = png_dir
    out = native.decode_image(gp, channels=3)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c].astype(np.uint8), gray)


def test_decode_jpeg_close_to_pil(png_dir):
    from PIL import Image

    _, _, _, jp = png_dir
    ref = np.asarray(Image.open(jp)).astype(np.float32)
    out = native.decode_image(jp)
    # same libjpeg underneath: exact or off-by-rounding
    assert np.max(np.abs(out - ref)) <= 1.0


def test_resize_matches_jax(png_dir):
    import jax.numpy as jnp
    from segmif_tpu.ops.image import resize_bilinear

    _, paths, _, _ = png_dir
    p, rgb = paths[0]
    out = native.decode_image(p, size=(12, 20))
    ref = np.asarray(resize_bilinear(
        jnp.asarray(rgb, jnp.float32)[None], (12, 20))[0])
    np.testing.assert_allclose(out, ref, atol=0.51)


def test_probe(png_dir):
    _, paths, _, _ = png_dir
    h, w, c = native.probe_image(paths[0][0])
    assert (h, w, c) == (24, 32, 3)


def test_native_loader_batches(png_dir):
    d, paths, _, _ = png_dir
    samples = [(str(p), str(p)) for p, _ in paths]  # 2 items per sample
    loader = native.NativeLoader(samples, batch_size=2, size=(24, 32),
                                 num_threads=2)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch.shape == (2, 2, 24, 32, 3)
        assert batch.dtype == np.float32
        assert batch.max() > 0  # actually decoded something
    loader.close()


def test_decode_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_image("/nonexistent/file.png")


def test_prefetcher_native_fast_path(tmp_path):
    """Prefetcher routes a path-exposing dataset through NativeLoader and
    yields batches whose contents match the per-sample python decode."""
    from PIL import Image

    from segmif_tpu.data.datasets import FusionFolderDataset
    from segmif_tpu.data.pipeline import Prefetcher

    rng = np.random.default_rng(7)
    for sub in ("Infrared", "Visible", "Mask2", "Label"):
        (tmp_path / sub).mkdir()
    names = [f"im{i}.png" for i in range(4)]
    for n in names:
        for sub in ("Infrared", "Visible", "Mask2"):
            arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
            if sub == "Infrared":
                arr = arr[..., 0]  # gray, expanded to 3ch on decode
            Image.fromarray(arr).save(tmp_path / sub / n)
        lab = rng.integers(0, 9, (24, 32), dtype=np.uint8)
        Image.fromarray(lab).save(tmp_path / "Label" / n)

    ds = FusionFolderDataset(tmp_path)
    pf = Prefetcher(ds, batch_size=2, num_threads=2, prefetch_depth=2)
    assert pf._native is not None, "native fast path not taken"
    it = iter(pf)
    batch = next(it)
    assert batch["ir"].shape == (2, 24, 32, 3)
    assert batch["label"].shape == (2, 24, 32)
    assert batch["label"].dtype == np.int32
    assert int(batch["label"].max()) <= 8
    # contents must match a python-path decode of SOME sample (order is
    # loader-shuffled); match on per-image mean fingerprints
    py = {np.float32(ds[i][2]).mean() for i in range(len(ds))}
    for b in range(2):
        assert any(abs(batch["vis"][b].mean() - m) < 1e-3 for m in py)
    pf.close()
