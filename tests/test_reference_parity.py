"""Golden parity against the ACTUAL reference code in /root/reference/core.

Round 1 tested against re-written torch oracles (test_torch_parity.py); these
tests close the loop the VERDICT asked for: randomly initialize the real
reference modules, export their state_dicts through the .pth converters, and
require the flax models to reproduce the reference forward outputs to fp
tolerance at multiple input sizes.

Covers: Fusion_Network3_ac (model_fusion.py:1026-1067), Network3 (the full
ImageNet-normalizing seg wrapper, :1068-1104), forward_fusion taps
(mix_transformer.py:358-375), and the full test_fusion.py:100-111 inference
chain vs JointPipeline.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_loader import load_reference_core

from segmif_tpu.models.fusion import FusionNetwork
from segmif_tpu.models.network import JointPipeline, SegmentationNetwork
from segmif_tpu.train.checkpoint import (
    load_torch_fusion_network,
    load_torch_seg_network,
)

torch.manual_seed(0)


@pytest.fixture(scope="module")
def refcore():
    return load_reference_core()


def _save(tmp_path, module, name):
    p = tmp_path / name
    torch.save(module.state_dict(), p)
    return p


def _nchw(x: np.ndarray) -> torch.Tensor:
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("h,w", [
    (32, 32),
    pytest.param(48, 64, marks=pytest.mark.slow),  # second shape regime
])
def test_fusion_network_vs_reference(refcore, tmp_path, h, w):
    _, mf, _ = refcore
    ref = mf.Fusion_Network3_ac().eval()
    path = _save(tmp_path, ref, "fusion.pth")

    rng = np.random.default_rng(0)
    ir = rng.uniform(0, 1, (2, h, w, 1)).astype(np.float32)
    vis = rng.uniform(0, 1, (2, h, w, 1)).astype(np.float32)
    tap1 = rng.normal(0, 1, (2, h, w, 64)).astype(np.float32)
    tap2 = rng.normal(0, 1, (2, h, w, 128)).astype(np.float32)

    with torch.no_grad():
        expect = _nhwc(ref(_nchw(ir), _nchw(vis), _nchw(tap1), _nchw(tap2)))

    params = load_torch_fusion_network(path)
    model = FusionNetwork()
    got = model.apply({"params": params}, jnp.asarray(ir), jnp.asarray(vis),
                      jnp.asarray(tap1), jnp.asarray(tap2))
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-5)


def test_fusion_network_average_vs_reference(refcore, tmp_path):
    """Fusion_Network3_Average (model_fusion.py:772-819): the sigmoid-gated
    AttentionModule ablation variant — 32-ch trunk, att1..att8 around the
    DRDBs, short tail (conv2 -> conv21)."""
    _, mf, _ = refcore
    ref = mf.Fusion_Network3_Average().eval()
    path = _save(tmp_path, ref, "fusion_avg.pth")

    rng = np.random.default_rng(4)
    h, w = 32, 48
    ir = rng.uniform(0, 1, (2, h, w, 1)).astype(np.float32)
    vis = rng.uniform(0, 1, (2, h, w, 1)).astype(np.float32)
    tap1 = rng.normal(0, 1, (2, h, w, 64)).astype(np.float32)
    tap2 = rng.normal(0, 1, (2, h, w, 128)).astype(np.float32)

    with torch.no_grad():
        expect = _nhwc(ref(_nchw(ir), _nchw(vis), _nchw(tap1), _nchw(tap2)))

    params = load_torch_fusion_network(path)
    model = FusionNetwork(channels=32, interaction="average", tail="short")
    got = model.apply({"params": params}, jnp.asarray(ir), jnp.asarray(vis),
                      jnp.asarray(tap1), jnp.asarray(tap2))
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-5)


@pytest.mark.parametrize("h,w", [
    pytest.param(64, 64, marks=pytest.mark.slow),  # second shape regime
    (32, 64),
])
def test_seg_network_vs_reference(refcore, tmp_path, h, w):
    """Full Network3 forward (x255 + ImageNet normalize + WeTr) vs
    SegmentationNetwork with a converted checkpoint."""
    _, mf, _ = refcore
    ref = mf.Network3("mit_b0", 9, 256, pretrained=None).eval()
    path = _save(tmp_path, ref, "seg.pth")

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        _, _, logits = ref(_nchw(img))
    expect = _nhwc(logits)

    params, stats = load_torch_seg_network(path)
    model = SegmentationNetwork("mit_b0", 9, 256)
    got = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-4)


def test_forward_fusion_taps_vs_reference(refcore, tmp_path):
    """Encoder taps on the RAW [0,1] guide (no normalization — the reference
    calls encoder.forward_fusion directly, train.py:358)."""
    _, mf, _ = refcore
    ref = mf.Network3("mit_b0", 9, 256, pretrained=None).eval()
    path = _save(tmp_path, ref, "seg_taps.pth")

    rng = np.random.default_rng(2)
    guide = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t0, t1 = ref.denoise_net.encoder.forward_fusion(_nchw(guide))

    params, stats = load_torch_seg_network(path)
    model = SegmentationNetwork("mit_b0", 9, 256)
    g0, g1 = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)},
        jnp.asarray(guide), method=SegmentationNetwork.encode_fusion_taps)
    np.testing.assert_allclose(np.asarray(g0), _nhwc(t0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), _nhwc(t1), atol=1e-4)


@pytest.mark.slow  # mit_b1 full-chain golden: ~40 s CPU (component
# goldens above are the fast witnesses)
def test_joint_pipeline_vs_reference_chain(refcore, tmp_path, monkeypatch):
    """The full test_fusion.py:100-111 inference chain: guide taps -> fusion
    -> cat(Y, CrCb) -> YCrCb2RGB -> clip, vs JointPipeline.fuse with both
    converted checkpoints loaded."""
    _, mf, _ = refcore
    # the reference color helpers are .cuda()-pinned (model_fusion.py:81-100);
    # run them on CPU by making .cuda a no-op
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    # mit_b1 is the smallest variant whose stage-1/2 taps are 64/128
    # channels — what Fusion_Network3_ac's conv3/conv4 expect
    # (mit_b0's 32-ch tap crashes the reference itself)
    seg_ref = mf.Network3("mit_b1", 9, 256, pretrained=None).eval()
    fus_ref = mf.Fusion_Network3_ac().eval()
    seg_path = _save(tmp_path, seg_ref, "seg_j.pth")
    fus_path = _save(tmp_path, fus_ref, "fus_j.pth")

    rng = np.random.default_rng(3)
    h, w = 64, 64
    ir = rng.uniform(0, 1, (1, h, w, 1)).astype(np.float32)
    vis = rng.uniform(0.05, 0.95, (1, h, w, 3)).astype(np.float32)
    guide = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        t_ir, t_vis, t_guide = _nchw(ir), _nchw(vis), _nchw(guide)
        out0, out1 = seg_ref.denoise_net.encoder.forward_fusion(t_guide)
        fused_y = fus_ref(t_ir, t_vis, out0, out1)
        vis_ycrcb = mf.RGB2YCrCb(t_vis)
        fusion_ycrcb = torch.cat(
            (fused_y, vis_ycrcb[:, 1:2], vis_ycrcb[:, 2:]), dim=1)
        fused_rgb = mf.YCrCb2RGB(fusion_ycrcb).clamp(0.0, 1.0)
    expect = _nhwc(fused_rgb)

    seg_params, seg_stats = load_torch_seg_network(seg_path)
    fus_params = load_torch_fusion_network(fus_path)
    model = JointPipeline("mit_b1", num_classes=9)
    variables = {
        "params": {"seg": jax.tree.map(jnp.asarray, seg_params),
                   "fusion": jax.tree.map(jnp.asarray, fus_params)},
        "batch_stats": {"seg": jax.tree.map(jnp.asarray, seg_stats)},
    }
    got_rgb, got_y = model.apply(variables, jnp.asarray(ir), jnp.asarray(vis),
                                 jnp.asarray(guide),
                                 method=JointPipeline.fuse)
    np.testing.assert_allclose(np.asarray(got_rgb), expect, atol=3e-4)


@pytest.mark.slow  # FCOS golden vs real torch GenTargets: ~33 s CPU
def test_gen_targets_vs_reference():
    """FCOS target assignment (gen_targets) vs the actual GenTargets module
    (/root/reference/core/loss.py:38-165) on random boxes."""
    import torch

    from segmif_tpu.losses.detection import gen_targets
    from tests.reference_loader import load_reference_loss

    refloss = load_reference_loss()
    strides = [8, 16]
    limit_ranges = [[-1, 64], [64, 999999]]
    shapes = [(8, 10), (4, 5)]
    b, m, ncls = 2, 3, 5

    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 40, (b, m, 1))
    y1 = rng.uniform(0, 40, (b, m, 1))
    wbox = rng.uniform(8, 50, (b, m, 1))
    hbox = rng.uniform(8, 50, (b, m, 1))
    boxes = np.concatenate([x1, y1, x1 + wbox, y1 + hbox], -1).astype(
        np.float32)
    classes = rng.integers(1, ncls, (b, m)).astype(np.int64)

    gen = refloss.GenTargets(strides, limit_ranges)
    logits = [[torch.zeros(b, ncls, h, w) for h, w in shapes],
              [torch.zeros(b, 1, h, w) for h, w in shapes],
              [torch.zeros(b, 4, h, w) for h, w in shapes]]
    with torch.no_grad():
        ref_cls, ref_cnt, ref_reg = gen(
            [logits, torch.from_numpy(boxes), torch.from_numpy(classes)])

    got_cls, got_cnt, got_reg = gen_targets(
        shapes, jnp.asarray(boxes), jnp.asarray(classes), strides,
        limit_ranges)
    np.testing.assert_array_equal(np.asarray(got_cls),
                                  ref_cls.numpy().astype(np.int32))
    np.testing.assert_allclose(np.asarray(got_cnt), ref_cnt.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_reg), ref_reg.numpy(),
                               atol=1e-4)
