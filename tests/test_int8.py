"""int8 DRDB quantization (kernels/int8.py): formulation + plumbing tests.

Speed evidence lives in experiments/e20_int8_drdb.py + OPTIMIZATION.md
round-4; accuracy parity on converted reference weights is recorded by
accuracy.py --drift_int8 (TPU). These tests pin the CPU-checkable claims:
the calibrate mode records true amaxes without changing the math, the int8
chain approximates the f32 chain within quantization-noise bounds, the
bottleneck scale-folding is exact, and every DRDB layout dispatches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def _weights(rng, c=16, g=8):
    w = {}
    cin = c
    for i in range(5):
        w[f"dconv{i + 1}"] = {
            "kernel": jnp.asarray(
                rng.normal(size=(3, 3, cin, g)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(rng.normal(size=(g,)).astype(np.float32)
                                * 0.05)}
        cin += g
    w["bottleneck"] = {
        "kernel": jnp.asarray(
            rng.normal(size=(1, 1, cin, c)).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.05)}
    return w


def test_int8_chain_tracks_f32_within_quant_noise():
    """One DRDB: int8-vs-f32 error must be quantization-scale, not
    formulation-scale — and far below the signal."""
    from segmif_tpu.kernels.int8 import drdb_chain_int8, record_amax
    from segmif_tpu.kernels.pallas_drdb import drdb_apply

    rng = np.random.default_rng(7)
    w = _weights(rng)
    x = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 16)).astype(np.float32))
    record = []
    ref = drdb_apply(x, w, "grouped", record=record)
    amax = record_amax(record[0])
    got = drdb_chain_int8(x, w, None, amax, dil=2)
    d = np.asarray(got) - np.asarray(ref)
    sd = float(np.std(np.asarray(ref - x)))  # the block's own contribution
    assert float(np.sqrt((d ** 2).mean())) < 0.05 * sd + 0.01, (
        f"int8 rmse {float(np.sqrt((d**2).mean())):.5f} vs block std {sd:.5f}")


def test_int8_bottleneck_scale_fold_exact():
    """The per-source scale fold into the bottleneck weight is ALGEBRAIC:
    with activations already exactly on the int8 grid and weights exactly
    quantizable, the int8 chain's bottleneck equals the f32 bottleneck."""
    from segmif_tpu.kernels.int8 import quantize_kernel

    rng = np.random.default_rng(3)
    c, g = 16, 8
    # weight exactly representable: integers in [-127, 127] times a scale,
    # with each output channel containing a full-scale +-127 entry so the
    # per-channel amax lands the quantization grid exactly on the integers
    kb = rng.integers(-127, 128, (1, 1, c + 5 * g, c)).astype(np.float32)
    kb[0, 0, 0, :] = 127.0
    kb = kb * (1.0 / 127.0)
    kbq, swb = quantize_kernel(jnp.asarray(kb))
    back = np.asarray(kbq, np.float32) * np.asarray(swb)
    np.testing.assert_allclose(back, kb, atol=1e-6)


@pytest.mark.parametrize("layout", ["image", "phase", "strips"])
def test_int8_all_layouts_dispatch(layout, monkeypatch):
    """quant='int8' runs through every DRDB layout the trunk uses."""
    from segmif_tpu.kernels.int8 import drdb_chain_int8, record_amax
    from segmif_tpu.kernels.pallas_drdb import (_phase_strips, drdb_apply,
                                                drdb_apply_phase, phase_split,
                                                drdb_strips_core,
                                                strip_row_mask)

    rng = np.random.default_rng(11)
    w = _weights(rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 16)).astype(np.float32))
    record = []
    ref = drdb_apply(x, w, "grouped", record=record)
    amax = record_amax(record[0])
    if layout == "image":
        got = drdb_apply(x, w, "grouped", qscales=amax)
    elif layout == "phase":
        monkeypatch.setenv("SEGMIF_AB", "phase_max_plane=4000")
        xp = phase_split(x)
        got = drdb_apply_phase(xp, w, qscales=amax)
        from segmif_tpu.kernels.pallas_drdb import phase_merge

        got = phase_merge(got)
    else:
        xp = phase_split(x)
        xs, m = _phase_strips(xp, 8, 5)
        ys = drdb_strips_core(xs, w, m, qscales=amax)
        from segmif_tpu.kernels.pallas_drdb import merge_strips

        got = merge_strips(ys, 1, 8, 5)
    d = np.asarray(got) - np.asarray(ref)
    sd = float(np.std(np.asarray(ref - x))) + 1e-8
    assert float(np.sqrt((d ** 2).mean())) < 0.05 * sd + 0.01


@pytest.mark.slow  # 4 FusionNetwork compiles: ~40 s CPU (chain-level
# int8 tests above are the fast witnesses)
def test_fusion_network_calibrate_then_int8(monkeypatch):
    """End-to-end plumbing through FusionNetwork: calibrate mode is a
    numerical no-op that fills the 'quant' collection; int8 mode consumes it
    and stays within a sane error band of the f32 output."""
    monkeypatch.setenv("SEGMIF_FORCE_PHASE_TRUNK", "1")
    from segmif_tpu.models.fusion import FusionNetwork

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(size=(1, 48, 64, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(1, 48, 64, 1)).astype(np.float32))
    t1 = jnp.asarray(rng.normal(size=(1, 48, 64, 16)).astype(np.float32))
    t2 = jnp.asarray(rng.normal(size=(1, 48, 64, 24)).astype(np.float32))
    m0 = FusionNetwork(channels=16, num_heads=4)
    params = m0.init(KEY, ir, vis, t1, t2)
    ref = m0.apply(params, ir, vis, t1, t2)

    mc = FusionNetwork(channels=16, num_heads=4, quant="calibrate")
    vc = mc.init(KEY, ir, vis, t1, t2)
    out_c, upd = mc.apply({"params": params["params"], "quant": vc["quant"]},
                          ir, vis, t1, t2, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref), atol=1e-6)
    for leaf in jax.tree.leaves(upd["quant"]):
        assert np.all(np.asarray(leaf) > 0), "calibration left zero amaxes"

    mq = FusionNetwork(channels=16, num_heads=4, quant="int8")
    out_q = mq.apply({"params": params["params"], "quant": upd["quant"]},
                     ir, vis, t1, t2)
    d = np.asarray(out_q) - np.asarray(ref)
    # end-to-end through 4 quantized DRDBs + 2 FFM rounds at random-init
    # weights: measured rmse ~0.25 vs ref std ~2.2 (the drift artifact on
    # converted REAL weights is the accuracy gate, accuracy.py)
    assert float(np.sqrt((d ** 2).mean())) < 0.25 * float(np.std(ref)), (
        f"int8 end-to-end rmse {float(np.sqrt((d**2).mean())):.4f} vs "
        f"ref std {float(np.std(ref)):.4f}")


@pytest.mark.slow
def test_int8_pallas_kernel_matches_xla_chain():
    """The fused int8 whole-DRDB Pallas kernel (pallas_drdb_int8.py,
    interpret mode) reproduces the XLA int8 chain on strips: same scales,
    same epilogue order; tolerance covers reciprocal-vs-division rounding
    at requant boundaries (<= 1 LSB in an r_i, damped by the bottleneck)."""
    from segmif_tpu.kernels.int8 import drdb_chain_int8, record_amax
    from segmif_tpu.kernels.pallas_drdb import (_phase_strips, phase_split,
                                                drdb_strips_core)
    from segmif_tpu.kernels.pallas_drdb_int8 import drdb_strips_int8_pallas

    rng = np.random.default_rng(5)
    w = _weights(rng)  # c=16, g=8
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 16)).astype(np.float32))
    xp = phase_split(x)
    xs, m = _phase_strips(xp, 8, 5)
    record = []
    drdb_strips_core(xs, w, m, record=record)
    amax = record_amax(record[0])

    ref = drdb_chain_int8(xs, w, m, amax, dil=1)
    got = drdb_strips_int8_pallas(xs, w, m, amax, interpret=True)
    # compare on OWNED rows only (halo rows are stale in both, but the
    # kernel's zero-fill dy shifts differ from the chain's conv padding
    # in the outermost halo ring). Tolerance: the XLA chain stores its
    # dequantized partial sums at BF16 width (a measured traffic
    # optimization); the kernel keeps them f32 in VMEM — the kernel is
    # the MORE accurate of the two, and the gap is bf16-rounding-scale
    # (measured maxdiff 0.024 at unit-scale activations).
    halo = 5
    ro = np.asarray(ref)[:, halo:-halo]
    go = np.asarray(got)[:, halo:-halo]
    d = np.abs(go - ro)
    assert float(d.max()) < 0.05, f"kernel-vs-chain maxdiff {d.max():.5f}"


def test_int8_grad_raises_not_silent_zero():
    """round/clip are differentiable with zero grad, so without a guard a
    quant='int8' model would train with silently-dead DRDB gradients. The
    entry/requant quantizers carry a custom_vjp whose bwd raises while the
    backward pass is traced (ADVICE r4)."""
    from segmif_tpu.kernels.int8 import drdb_chain_int8, record_amax
    from segmif_tpu.kernels.pallas_drdb import drdb_apply

    rng = np.random.default_rng(3)
    w = _weights(rng)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 16)).astype(np.float32))
    record = []
    drdb_apply(x, w, "grouped", record=record)
    amax = record_amax(record[0])

    def loss(xi):
        return jnp.sum(drdb_chain_int8(xi, w, None, amax, dil=2))

    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(loss)(x)
