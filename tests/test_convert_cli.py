"""End-to-end torch->orbax conversion: synthesize .pth files with the
reference's exact key layout (including dead ffm2.* weights), convert via
the CLI, and run the converted model."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from segmif_tpu.train.checkpoint import (
    load_torch_fusion_network,
    load_torch_seg_network,
)

pytestmark = pytest.mark.slow  # full conversion round-trips take minutes


def _fusion_state_dict(rng):
    sd = {}

    def t(*shape, scale=0.05):
        return torch.from_numpy(rng.normal(size=shape,
                                           scale=scale).astype(np.float32))

    for name, cin in (("conv1_ir", 1), ("conv1_vis", 1)):
        sd[f"{name}.weight"] = t(64, cin, 3, 3)
        sd[f"{name}.bias"] = t(64)
    for d in range(1, 5):
        cin = 64
        for i in range(1, 6):
            sd[f"DRDB{d}.Dcov{i}.weight"] = t(32, cin, 3, 3)
            sd[f"DRDB{d}.Dcov{i}.bias"] = t(32)
            cin += 32
        sd[f"DRDB{d}.conv.weight"] = t(64, cin, 1, 1)
        sd[f"DRDB{d}.conv.bias"] = t(64)
    sd["conv2.weight"] = t(64, 128, 3, 3)
    sd["conv2.bias"] = t(64)
    sd["conv21.weight"] = t(32, 64, 3, 3)
    sd["conv21.bias"] = t(32)
    sd["conv22.weight"] = t(1, 32, 3, 3)
    sd["conv22.bias"] = t(1)
    sd["conv3.weight"] = t(64, 64, 1, 1)
    sd["conv3.bias"] = t(64)
    sd["conv4.weight"] = t(64, 128, 1, 1)
    sd["conv4.bias"] = t(64)
    sd["relu.weight"] = torch.full((1,), 0.25)
    for ffm in ("ffm", "ffm2"):  # ffm2 = dead weights, must be dropped
        for i in (1, 2, 3):
            sd[f"{ffm}.cross.channel_proj{i}.weight"] = t(128, 64)
            sd[f"{ffm}.cross.channel_proj{i}.bias"] = t(128)
        sd[f"{ffm}.cross.cross_attn.kv3.weight"] = t(128, 64)
        sd[f"{ffm}.cross.cross_attn2.kv1.weight"] = t(128, 64)
        sd[f"{ffm}.cross.cross_attn2.kv2.weight"] = t(128, 64)
        for i in (1, 2):
            sd[f"{ffm}.cross.end_proj{i}.weight"] = t(64, 128)
            sd[f"{ffm}.cross.end_proj{i}.bias"] = t(64)
            sd[f"{ffm}.cross.norm{i}.weight"] = torch.ones(64)
            sd[f"{ffm}.cross.norm{i}.bias"] = torch.zeros(64)
    return sd


def test_fusion_checkpoint_conversion_runs(tmp_path):
    rng = np.random.default_rng(0)
    sd = _fusion_state_dict(rng)
    pth = tmp_path / "modelfusion-final2.pth"
    torch.save(sd, pth)

    params = load_torch_fusion_network(pth)
    # param tree must exactly match a fresh FusionNetwork init
    from segmif_tpu.models.fusion import FusionNetwork

    model = FusionNetwork()
    ir = jnp.full((1, 32, 32, 1), 0.5)
    ref_vars = model.init(jax.random.PRNGKey(0), ir, ir,
                          jnp.zeros((1, 32, 32, 64)),
                          jnp.zeros((1, 32, 32, 128)))
    ref_tree = jax.tree.structure(ref_vars["params"])
    got_tree = jax.tree.structure(jax.tree.map(jnp.asarray, params))
    assert ref_tree == got_tree
    # shapes must line up and the model must run with converted params
    for a, b in zip(jax.tree.leaves(ref_vars["params"]),
                    jax.tree.leaves(params)):
        assert a.shape == np.asarray(b).shape
    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      ir, ir, jnp.zeros((1, 32, 32, 64)),
                      jnp.zeros((1, 32, 32, 128)))
    assert out.shape == (1, 32, 32, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def _seg_state_dict(rng, num_classes=9):
    """mit_b0-sized Network3 state dict (reference key layout)."""
    sd = {}

    def t(*shape, scale=0.05):
        return torch.from_numpy(rng.normal(size=shape,
                                           scale=scale).astype(np.float32))

    dims = [32, 64, 160, 256]
    heads = [1, 2, 5, 8]
    srs = [8, 4, 2, 1]
    pre = "denoise_net.encoder."
    in_ch = 3
    for s in range(4):
        d = dims[s]
        k = 7 if s == 0 else 3
        sd[f"{pre}patch_embed{s + 1}.proj.weight"] = t(d, in_ch, k, k)
        sd[f"{pre}patch_embed{s + 1}.proj.bias"] = t(d)
        sd[f"{pre}patch_embed{s + 1}.norm.weight"] = torch.ones(d)
        sd[f"{pre}patch_embed{s + 1}.norm.bias"] = torch.zeros(d)
        for i in range(2):  # mit_b0 depths (2,2,2,2)
            b = f"{pre}block{s + 1}.{i}."
            for nm in ("norm1", "norm2"):
                sd[b + nm + ".weight"] = torch.ones(d)
                sd[b + nm + ".bias"] = torch.zeros(d)
            sd[b + "attn.q.weight"] = t(d, d)
            sd[b + "attn.q.bias"] = t(d)
            sd[b + "attn.kv.weight"] = t(2 * d, d)
            sd[b + "attn.kv.bias"] = t(2 * d)
            sd[b + "attn.proj.weight"] = t(d, d)
            sd[b + "attn.proj.bias"] = t(d)
            if srs[s] > 1:
                sd[b + "attn.sr.weight"] = t(d, d, srs[s], srs[s])
                sd[b + "attn.sr.bias"] = t(d)
                sd[b + "attn.norm.weight"] = torch.ones(d)
                sd[b + "attn.norm.bias"] = torch.zeros(d)
            sd[b + "mlp.fc1.weight"] = t(4 * d, d)
            sd[b + "mlp.fc1.bias"] = t(4 * d)
            sd[b + "mlp.dwconv.dwconv.weight"] = t(4 * d, 1, 3, 3)
            sd[b + "mlp.dwconv.dwconv.bias"] = t(4 * d)
            sd[b + "mlp.fc2.weight"] = t(d, 4 * d)
            sd[b + "mlp.fc2.bias"] = t(d)
        sd[f"{pre}norm{s + 1}.weight"] = torch.ones(d)
        sd[f"{pre}norm{s + 1}.bias"] = torch.zeros(d)
        in_ch = d
    dpre = "denoise_net.decoder."
    emb = 256
    for i, d in enumerate(dims):
        sd[f"{dpre}linear_c{i + 1}.proj.weight"] = t(emb, d)
        sd[f"{dpre}linear_c{i + 1}.proj.bias"] = t(emb)
    sd[dpre + "linear_fuse.conv.weight"] = t(emb, 4 * emb, 1, 1)
    sd[dpre + "linear_fuse.bn.weight"] = torch.ones(emb)
    sd[dpre + "linear_fuse.bn.bias"] = torch.zeros(emb)
    sd[dpre + "linear_fuse.bn.running_mean"] = torch.zeros(emb)
    sd[dpre + "linear_fuse.bn.running_var"] = torch.ones(emb)
    sd[dpre + "linear_fuse.bn.num_batches_tracked"] = torch.zeros((),
                                                                  dtype=torch.long)
    sd[dpre + "linear_pred.weight"] = t(num_classes, emb, 1, 1)
    sd[dpre + "linear_pred.bias"] = t(num_classes)
    sd["denoise_net.classifier.weight"] = t(num_classes, dims[-1], 1, 1)
    return sd


def test_seg_checkpoint_conversion_runs(tmp_path):
    rng = np.random.default_rng(1)
    sd = _seg_state_dict(rng)
    pth = tmp_path / "model-fusion_add_final2.pth"
    torch.save(sd, pth)
    params, stats = load_torch_seg_network(pth)

    from segmif_tpu.models.network import SegmentationNetwork

    model = SegmentationNetwork(backbone="mit_b0", num_classes=9)
    x = jnp.full((1, 64, 64, 3), 0.5)
    ref_vars = model.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(ref_vars["params"])
            == jax.tree.structure(jax.tree.map(jnp.asarray, params)))
    logits = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, stats)}, x)
    assert logits.shape == (1, 16, 16, 9)
    assert np.all(np.isfinite(np.asarray(logits)))
