import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmif_tpu.models import (
    DRDB,
    FusionNetwork,
    JointPipeline,
    MIT_VARIANTS,
    MixVisionTransformer,
    SegFormerHead,
    SegmentationNetwork,
    SimpleFusionNetwork,
)

KEY = jax.random.PRNGKey(0)


def test_mit_b0_stage_shapes():
    # pure shape property: abstract-eval only, no compile (fast-tier budget)
    model = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
    x = jnp.zeros((1, 64, 96, 3))
    params = jax.eval_shape(model.init, KEY, x)
    feats = jax.eval_shape(model.apply, params, x)
    dims = MIT_VARIANTS["mit_b0"].embed_dims
    assert [f.shape for f in feats] == [
        (1, 16, 24, dims[0]),
        (1, 8, 12, dims[1]),
        (1, 4, 6, dims[2]),
        (1, 2, 3, dims[3]),
    ]


@pytest.mark.parametrize("variant,depths", [("mit_b1", (2, 2, 2, 2)),
                                            ("mit_b3", (3, 4, 18, 3)),
                                            ("mit_b5", (3, 6, 40, 3))])
def test_mit_variant_configs(variant, depths):
    assert MIT_VARIANTS[variant].depths == depths
    assert MIT_VARIANTS[variant].embed_dims == (64, 128, 320, 512)


def test_mit_param_count_b0():
    # param count needs only shapes: abstract init, no compile
    model = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
    params = jax.eval_shape(model.init, KEY, jnp.zeros((1, 64, 64, 3)))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # published mit_b0 encoder is ~3.32M params
    assert 3.0e6 < n < 3.7e6, n


def test_segformer_head_shape():
    feats = [
        jnp.zeros((2, 16, 16, 32)),
        jnp.zeros((2, 8, 8, 64)),
        jnp.zeros((2, 4, 4, 160)),
        jnp.zeros((2, 2, 2, 256)),
    ]
    head = SegFormerHead(num_classes=9)
    variables = jax.eval_shape(head.init, KEY, feats)
    logits = jax.eval_shape(head.apply, variables, feats)
    assert logits.shape == (2, 16, 16, 9)
    # train mode mutates batch stats (abstract eval keeps the claim)
    logits2, mutated = jax.eval_shape(
        lambda v, f: head.apply(v, f, deterministic=False,
                                mutable=["batch_stats"],
                                rngs={"dropout": KEY}), variables, feats)
    assert logits2.shape == (2, 16, 16, 9)
    assert "batch_stats" in mutated


def test_drdb_residual_shape():
    m = DRDB(channels=16, growth_rate=8)
    x = jnp.ones((1, 8, 8, 16))
    params = jax.eval_shape(m.init, KEY, x)
    y = jax.eval_shape(m.apply, params, x)
    assert y.shape == x.shape


@pytest.mark.parametrize("interaction", ["both", "moam", "soam", "concat",
                                         "add", "average", "none"])
def test_fusion_network_variants(interaction):
    m = FusionNetwork(channels=16, num_heads=4, interaction=interaction)
    ir = jnp.ones((1, 16, 16, 1)) * 0.5
    vis = jnp.ones((1, 16, 16, 1)) * 0.3
    tap1 = jnp.ones((1, 16, 16, 8))
    tap2 = jnp.ones((1, 16, 16, 24))
    params = m.init(KEY, ir, vis, tap1, tap2)
    y = m.apply(params, ir, vis, tap1, tap2)
    assert y.shape == (1, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_fusion_network_ffm_weight_shared():
    """The FFM must be weight-shared across both interaction rounds
    (reference quirk: ffm reused, ffm2 dead)."""
    m = FusionNetwork(channels=16, num_heads=4)
    ir = jnp.ones((1, 8, 8, 1))
    params = m.init(KEY, ir, ir, jnp.ones((1, 8, 8, 4)), jnp.ones((1, 8, 8, 6)))
    keys = list(params["params"].keys())
    assert "ffm" in keys and "ffm2" not in keys


def test_simple_fusion_network():
    m = SimpleFusionNetwork(channels=8)
    ir = jnp.ones((1, 8, 8, 1)) * 0.7
    vis = jnp.ones((1, 8, 8, 1)) * 0.2
    params = m.init(KEY, ir, vis)
    y = m.apply(params, ir, vis)
    assert y.shape == (1, 8, 8, 1)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_segmentation_network_logits():
    m = SegmentationNetwork(backbone="mit_b0", num_classes=9)
    x = jnp.full((1, 32, 32, 3), 0.5)
    variables = m.init(KEY, x)
    logits = m.apply(variables, x)
    assert logits.shape == (1, 8, 8, 9)
    up = m.apply(variables, x, (32, 32), method=m.logits_at)
    assert up.shape == (1, 32, 32, 9)


def test_joint_pipeline_single_graph():
    m = JointPipeline(backbone="mit_b0", num_classes=9)
    ir = jnp.full((1, 32, 32, 1), 0.6)
    vis = jnp.full((1, 32, 32, 3), 0.4)
    variables = m.init(KEY, ir, vis)

    @jax.jit
    def run(v, ir, vis):
        return m.apply(v, ir, vis)

    fused_rgb, fused_y, logits = run(variables, ir, vis)
    assert fused_rgb.shape == (1, 32, 32, 3)
    assert fused_y.shape == (1, 32, 32, 1)
    assert logits.shape == (1, 8, 8, 9)
    assert float(jnp.min(fused_rgb)) >= 0.0
    assert float(jnp.max(fused_rgb)) <= 1.0

    # serving mode: precomputed guide taps must reproduce the default path
    # exactly (the taps are per-dataset constants at inference —
    # OPTIMIZATION.md "Next hotspots" #3). Raw (native-res) taps are the
    # default path's own computation -> bit-exact; full-res taps take the
    # reference forward_fusion layout (proj after upsample) -> fp tolerance.
    guide = jnp.full((1, 32, 32, 3), 0.7)
    raw = m.apply(variables, guide, method=JointPipeline.guide_taps_raw)
    direct = m.apply(variables, ir, vis, guide)
    served = m.apply(variables, ir, vis, taps=raw)
    for a, b in zip(direct, served):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.slow  # two extra full-pipeline compiles; low-res-vs-full-res
# tap equivalence also covered by
# test_fusion_network_lowres_taps_match_fullres
def test_joint_pipeline_fullres_taps_match():
    m = JointPipeline(backbone="mit_b0", num_classes=9)
    ir = jnp.full((1, 32, 32, 1), 0.6)
    vis = jnp.full((1, 32, 32, 3), 0.4)
    variables = m.init(KEY, ir, vis)
    guide = jnp.full((1, 32, 32, 3), 0.7)
    raw = m.apply(variables, guide, method=JointPipeline.guide_taps_raw)
    direct = m.apply(variables, ir, vis, guide)
    full = m.apply(variables, guide, method=JointPipeline.guide_taps)
    assert full[0].shape[1] == 32 and raw[0].shape[1] == 8
    served_full = m.apply(variables, ir, vis, taps=full)
    for a, b in zip(direct, served_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("interaction", ["both", "none", "concat", "add",
                                         "moam", "soam"])
def test_fusion_network_phase_trunk_matches_image_trunk(interaction,
                                                        monkeypatch):
    """The phase-persistent trunk (split once -> DRDB/FFM on phase planes ->
    merge once) is numerically the image-space pipeline."""
    from segmif_tpu.models.fusion import FusionNetwork

    rng = np.random.default_rng(11)
    ir = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    tap1 = jnp.asarray(rng.normal(size=(2, 48, 64, 16)).astype(np.float32))
    tap2 = jnp.asarray(rng.normal(size=(2, 48, 64, 24)).astype(np.float32))
    m = FusionNetwork(channels=16, num_heads=4, interaction=interaction)
    params = m.init(KEY, ir, vis, tap1, tap2)

    monkeypatch.delenv("SEGMIF_FORCE_PHASE_TRUNK", raising=False)
    ref = m.apply(params, ir, vis, tap1, tap2)
    monkeypatch.setenv("SEGMIF_FORCE_PHASE_TRUNK", "1")
    got = m.apply(params, ir, vis, tap1, tap2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("token", ["ffm_tokens",
                                   "drdb_phase_nostrip",
                                   "phase_split_reshape",
                                   "strips_trunk",
                                   "strips_trunk,strips_gram_slice",
                                   "strips_trunk,halos_concat",
                                   "conv1_paired",
                                   "conv2_split"])
def test_layout_ab_flags_match_default(token, monkeypatch):
    """Every layout A/B switch (measured slower on v5e and kept only as an
    experiment toggle behind SEGMIF_AB=<token> — OPTIMIZATION.md round-3,
    segmif_tpu/utils/ab.py registry) is numerically EXACT vs the default
    path. NOTE: the tokens are read at trace time; each apply below builds
    a fresh trace, which is the only supported way to flip them (advisor
    round-2 #3/#4)."""
    from segmif_tpu.models.fusion import FusionNetwork

    rng = np.random.default_rng(17)
    ir = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    tap1 = jnp.asarray(rng.normal(size=(2, 48, 64, 16)).astype(np.float32))
    tap2 = jnp.asarray(rng.normal(size=(2, 48, 64, 24)).astype(np.float32))
    m = FusionNetwork(channels=16, num_heads=4)
    params = m.init(KEY, ir, vis, tap1, tap2)
    # the switches only have consumers on the phase/strips trunks (TPU
    # default); force the trunk on so the CPU test exercises the real code
    # paths. The strips-internal A/B tokens carry strips_trunk in BOTH
    # runs... except the reference run, which must stay the true default;
    # compare against a strips-trunk baseline for those.
    monkeypatch.setenv("SEGMIF_FORCE_PHASE_TRUNK", "1")
    base = "strips_trunk" if token.startswith("strips_trunk,") else ""
    if token == "conv2_split":
        # the split consumer also needs the strip-conv tail active
        # (SEGMIF_AB=pallas_tail is covered by its dedicated interpret-mode
        # test in test_drdb_kernel.py — this test's shapes don't divide
        # the kernel's tile, so the dispatcher would silently fall back)
        monkeypatch.setenv("SEGMIF_FORCE_STRIPS", "1")
    if base:
        monkeypatch.setenv("SEGMIF_AB", base)
    else:
        monkeypatch.delenv("SEGMIF_AB", raising=False)
    ref = m.apply(params, ir, vis, tap1, tap2)
    monkeypatch.setenv("SEGMIF_AB", token)
    got = m.apply(params, ir, vis, tap1, tap2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ab_default_value_tokens_match_unset(monkeypatch):
    """Setting the surviving tuning knobs to their DEFAULT values through
    SEGMIF_AB must be a no-op vs an empty environment — catches accidental
    coupling between the A/B registry and real configuration (VERDICT r3
    weak #5). Also pins the registry API: unknown tokens raise."""
    import pytest as _pytest

    from segmif_tpu.models.fusion import FusionNetwork
    from segmif_tpu.utils.ab import ab

    rng = np.random.default_rng(23)
    ir = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    tap1 = jnp.asarray(rng.normal(size=(2, 48, 64, 16)).astype(np.float32))
    tap2 = jnp.asarray(rng.normal(size=(2, 48, 64, 24)).astype(np.float32))
    m = FusionNetwork(channels=16, num_heads=4)
    params = m.init(KEY, ir, vis, tap1, tap2)
    monkeypatch.setenv("SEGMIF_FORCE_PHASE_TRUNK", "1")
    monkeypatch.delenv("SEGMIF_AB", raising=False)
    ref = m.apply(params, ir, vis, tap1, tap2)
    monkeypatch.setenv("SEGMIF_AB",
                       "phase_max_plane=22400,tail_max_plane=42000")
    got = m.apply(params, ir, vis, tap1, tap2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)
    monkeypatch.setenv("SEGMIF_AB", "not_a_registered_token")
    with _pytest.raises(ValueError):
        ab("ffm_tokens")


@pytest.mark.parametrize("force_phase", [False, True])
def test_fusion_network_lowres_taps_match_fullres(force_phase, monkeypatch):
    """Native-resolution taps (proj at low res + phase-layout upsample) give
    the same output as the reference's full-res forward_fusion taps — the
    1x1 proj commutes with the bilinear upsample, so the SAME weights serve
    both layouts."""
    from segmif_tpu.models.fusion import FusionNetwork
    from segmif_tpu.ops.image import resize_bilinear

    if force_phase:
        monkeypatch.setenv("SEGMIF_FORCE_PHASE_TRUNK", "1")
    else:
        monkeypatch.delenv("SEGMIF_FORCE_PHASE_TRUNK", raising=False)
    rng = np.random.default_rng(13)
    ir = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(2, 48, 64, 1)).astype(np.float32))
    lo1 = jnp.asarray(rng.normal(size=(2, 12, 16, 16)).astype(np.float32))
    lo2 = jnp.asarray(rng.normal(size=(2, 6, 8, 24)).astype(np.float32))
    hi1 = resize_bilinear(lo1, (48, 64))
    hi2 = resize_bilinear(lo2, (48, 64))
    m = FusionNetwork(channels=16, num_heads=4)
    params = m.init(KEY, ir, vis, hi1, hi2)   # same param tree either way
    ref = m.apply(params, ir, vis, hi1, hi2)
    got = m.apply(params, ir, vis, lo1, lo2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
