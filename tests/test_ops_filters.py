import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from segmif_tpu.ops import (
    gaussian_blur,
    gaussian_kernel_2d_grid,
    sobel_magnitude,
    ssim,
    unsharp_pyramid,
    patch_entropy,
)


def _torch_depthwise(x_nhwc, k2d, pad):
    """Oracle: torch depthwise conv with zero padding."""
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    c = x.shape[1]
    k = torch.from_numpy(k2d)[None, None].repeat(c, 1, 1, 1)
    y = tF.conv2d(x, k, padding=pad, groups=c)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def test_sobel_vs_torch(rng):
    x = rng.normal(size=(2, 10, 12, 1)).astype(np.float32)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
    ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float32)
    expect = np.abs(_torch_depthwise(x, kx, 1)) + np.abs(_torch_depthwise(x, ky, 1))
    got = np.asarray(sobel_magnitude(jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_gaussian_kernel_normalized():
    for size in (3, 5, 7):
        k = np.asarray(gaussian_kernel_2d_grid(size, 2.0))
        assert abs(k.sum() - 1.0) < 1e-6
        # symmetric
        np.testing.assert_allclose(k, k.T, atol=1e-7)
        np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-7)


def test_gaussian_blur_vs_torch(rng):
    x = rng.normal(size=(1, 9, 11, 2)).astype(np.float32)
    k = np.asarray(gaussian_kernel_2d_grid(5, 2.0), dtype=np.float32)
    expect = _torch_depthwise(x, k, 2)
    got = np.asarray(gaussian_blur(jnp.asarray(x), 5, 2.0))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_unsharp_pyramid_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
    pyr = unsharp_pyramid(x)
    assert len(pyr) == 3
    for level in pyr:
        assert level.shape == x.shape
    # a constant image has zero band-pass response away from borders
    const = jnp.ones((1, 16, 16, 1))
    for level in unsharp_pyramid(const):
        interior = np.asarray(level)[0, 4:-4, 4:-4, 0]
        np.testing.assert_allclose(interior, 0.0, atol=1e-6)


def _torch_ssim(img1_nhwc, img2_nhwc, window_size=11, sigma=1.5):
    """Oracle implementing the classic windowed SSIM exactly as published
    (Gaussian window, zero padding, biased variances)."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    w2d = np.outer(g, g)
    img1 = torch.from_numpy(np.transpose(img1_nhwc, (0, 3, 1, 2)))
    img2 = torch.from_numpy(np.transpose(img2_nhwc, (0, 3, 1, 2)))
    c = img1.shape[1]
    w = torch.from_numpy(w2d)[None, None].repeat(c, 1, 1, 1)
    pad = window_size // 2

    def blur(t):
        return tF.conv2d(t, w, padding=pad, groups=c)

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 * mu1
    s2 = blur(img2 * img2) - mu2 * mu2
    s12 = blur(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return smap.mean().item()


def test_ssim_vs_oracle(rng):
    a = rng.uniform(0, 1, size=(2, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    expect = _torch_ssim(a, b)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - expect) < 1e-4


def test_ssim_identity(rng):
    a = jnp.asarray(rng.uniform(0, 1, size=(1, 24, 24, 1)).astype(np.float32))
    val = float(ssim(a, a))
    assert val > 0.99


def test_patch_entropy_behavior(rng):
    # uniform-noise image must have higher entropy than a constant image
    flat = jnp.full((1, 16, 16, 1), 0.5)
    noisy = jnp.asarray(rng.uniform(0, 1, size=(1, 16, 16, 1)).astype(np.float32))
    e_flat = float(patch_entropy(flat))
    e_noisy = float(patch_entropy(noisy))
    assert e_noisy > e_flat


def test_upsample_bilinear_int_matches_resize():
    from segmif_tpu.ops.image import resize_bilinear, upsample_bilinear_int

    rng = np.random.default_rng(7)
    for s, (h, w) in ((2, (5, 7)), (4, (6, 8)), (8, (3, 4))):
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
        ref = resize_bilinear(x, (h * s, w * s))
        got = upsample_bilinear_int(x, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_resize_bilinear_phase_matches_split_of_resize():
    """resize_bilinear_phase == phase_split(resize_bilinear) — the tap
    upsampler that lands directly in the fusion trunk's phase layout."""
    from segmif_tpu.kernels.pallas_drdb import phase_split
    from segmif_tpu.ops.image import resize_bilinear, resize_bilinear_phase

    rng = np.random.default_rng(11)
    for (ih, iw), (oh, ow) in (((12, 16), (48, 64)), ((8, 10), (64, 80)),
                               ((15, 20), (30, 40))):
        x = jnp.asarray(rng.normal(size=(2, ih, iw, 5)).astype(np.float32))
        ref = phase_split(resize_bilinear(x, (oh, ow)))
        got = resize_bilinear_phase(x, (oh, ow))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_toeplitz_vs_conv_grad_agreement(rng):
    """e26 promoted to the fast tier (VERDICT r4 #7): the Toeplitz-matmul
    loss formulations (ops/ssim.py::_blur, ops/filters.py::separable_filter)
    must agree with the depthwise-conv forms at GRAD level in f32 on CPU, so
    the next loss-formulation surgery is guarded without a TPU window.
    (bf16/TPU-scale evidence: experiments/e26_blur_bf16_parity.py.)"""
    import jax
    from segmif_tpu.ops.filters import gaussian_kernel_1d

    def blur_conv(x, win, pad):
        dn = ("NHWC", "HWIO", "NHWC")
        kh = jnp.tile(win[:, None, None, None], (1, 1, 1, x.shape[-1]))
        kw = jnp.tile(win[None, :, None, None], (1, 1, 1, x.shape[-1]))
        x = jax.lax.conv_general_dilated(
            x, kh.astype(x.dtype), (1, 1), [(pad, pad), (0, 0)],
            dimension_numbers=dn, feature_group_count=x.shape[-1])
        return jax.lax.conv_general_dilated(
            x, kw.astype(x.dtype), (1, 1), [(0, 0), (pad, pad)],
            dimension_numbers=dn, feature_group_count=x.shape[-1])

    def ssim_conv(a, b, window_size=11, sigma=1.5):
        win = jnp.asarray(gaussian_kernel_1d(window_size, sigma), a.dtype)
        pad = window_size // 2
        mu1, mu2 = blur_conv(a, win, pad), blur_conv(b, win, pad)
        s1 = blur_conv(a * a, win, pad) - mu1 * mu1
        s2 = blur_conv(b * b, win, pad) - mu2 * mu2
        s12 = blur_conv(a * b, win, pad) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        return jnp.mean(m)

    a = jnp.asarray(rng.uniform(0, 1, (2, 24, 28, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 24, 28, 1)).astype(np.float32))

    # SSIM: forward + grad w.r.t. the fused image (the training signal)
    s_new, g_new = jax.value_and_grad(lambda x: ssim(x, b))(a)
    s_old, g_old = jax.value_and_grad(lambda x: ssim_conv(x, b))(a)
    assert abs(float(s_new) - float(s_old)) < 1e-6
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-5, atol=1e-7)

    # Sobel magnitude (the gradient loss): grad agreement too
    def sobel_conv_sum(x):
        kx = jnp.asarray([[-1., 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
        ky = jnp.asarray([[1., 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
        c = x.shape[-1]
        def dw(t, k2):
            kern = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
            return jax.lax.conv_general_dilated(
                t, kern, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
        return jnp.sum(jnp.abs(dw(x, kx)) + jnp.abs(dw(x, ky)))

    gs_new = jax.grad(lambda x: jnp.sum(sobel_magnitude(x)))(a)
    gs_old = jax.grad(sobel_conv_sum)(a)
    np.testing.assert_allclose(np.asarray(gs_new), np.asarray(gs_old),
                               rtol=1e-5, atol=1e-6)

    # gaussian_blur (LapLoss levels): grad agreement
    gb_new = jax.grad(lambda x: jnp.sum(gaussian_blur(x, 5, 2.0)))(a)
    win5 = jnp.exp(-((jnp.arange(5.) - 2.0) ** 2) / (2 * 2.0**2))
    win5 = win5 / jnp.sum(win5)
    gb_old = jax.grad(lambda x: jnp.sum(blur_conv(x, win5, 2)))(a)
    np.testing.assert_allclose(np.asarray(gb_new), np.asarray(gb_old),
                               rtol=1e-5, atol=1e-6)
