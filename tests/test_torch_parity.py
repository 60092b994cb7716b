"""Numerical parity between the flax modules and torch oracles.

The oracles are compact, independently-written torch modules using the SAME
parameter key names as the reference architecture (so the checkpoint
converter maps them), and the published math of SegFormer / SegMiF. Passing
these means a converted reference .pth will reproduce reference outputs.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as tF
import jax
import jax.numpy as jnp

from segmif_tpu.models.mit import EfficientSelfAttention, MixFFN, OverlapPatchEmbed
from segmif_tpu.models.fusion import CrossPath, DRDB
from segmif_tpu.models.segformer_head import SegFormerHead
from segmif_tpu.train.checkpoint import (
    convert_mit_encoder,
    convert_segformer_head,
    _t, _conv, _dwconv, _set,
)

torch.manual_seed(0)
KEY = jax.random.PRNGKey(42)


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# --------------------------------------------------------------- oracles ----

class TorchSRAttention(nn.Module):
    """Efficient self-attention oracle: softmax(q k^T / sqrt(d)) v with K/V
    from an sr-strided conv of the token grid."""

    def __init__(self, dim, heads, sr):
        super().__init__()
        self.h, self.sr, self.dim = heads, sr, dim
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, 2 * dim)
        self.proj = nn.Linear(dim, dim)
        if sr > 1:
            self.sr_conv = nn.Conv2d(dim, dim, sr, stride=sr)
            self.norm = nn.LayerNorm(dim)

    def forward(self, x, H, W):
        b, n, c = x.shape
        d = c // self.h
        q = self.q(x).view(b, n, self.h, d)
        src = x
        if self.sr > 1:
            g = x.transpose(1, 2).reshape(b, c, H, W)
            g = self.sr_conv(g).flatten(2).transpose(1, 2)
            src = self.norm(g)
        kv = self.kv(src)
        m = src.shape[1]
        k = kv[..., :c].view(b, m, self.h, d)
        v = kv[..., c:].view(b, m, self.h, d)
        att = torch.einsum("bnhd,bmhd->bhnm", q, k) * d**-0.5
        att = att.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, c)
        return self.proj(out)


class TorchMixFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dw = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        b, n, _ = x.shape
        x = self.fc1(x)
        h = x.shape[-1]
        x = x.transpose(1, 2).view(b, h, H, W)
        x = self.dw(x).flatten(2).transpose(1, 2)
        x = tF.gelu(x)  # exact erf gelu
        return self.fc2(x)


class TorchCrossPath(nn.Module):
    """Dual linear cross-attention oracle (gated projections, context-vector
    attention, concat, residual + LN)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.p1 = nn.Linear(dim, 2 * dim)
        self.p2 = nn.Linear(dim, 2 * dim)
        self.p3 = nn.Linear(dim, 2 * dim)
        self.kv3 = nn.Linear(dim, 2 * dim, bias=False)
        self.kv1 = nn.Linear(dim, 2 * dim, bias=False)
        self.kv2 = nn.Linear(dim, 2 * dim, bias=False)
        self.e1 = nn.Linear(2 * dim, dim)
        self.e2 = nn.Linear(2 * dim, dim)
        self.n1 = nn.LayerNorm(dim)
        self.n2 = nn.LayerNorm(dim)

    @staticmethod
    def _linattn(q, kv, b, h):
        c = q.shape[-1]
        d = c // h
        k = kv[..., :c].view(b, -1, h, d)
        v = kv[..., c:].view(b, -1, h, d)
        qh = q.view(b, -1, h, d)
        ctx = torch.einsum("bmhd,bmhe->bhde", k, v) * d**-0.5
        ctx = ctx.softmax(dim=-2)
        return torch.einsum("bnhd,bhde->bnhe", qh, ctx).reshape(b, -1, c)

    def forward(self, x1, x2, seg):
        b = x1.shape[0]
        y1, u1 = torch.relu(self.p1(x1)).chunk(2, -1)
        y2, u2 = torch.relu(self.p2(x2)).chunk(2, -1)
        y3, u3 = torch.relu(self.p3(seg)).chunk(2, -1)
        kv3 = self.kv3(u3)
        v1 = self._linattn(u1, kv3, b, self.h)
        v2 = self._linattn(u2, kv3, b, self.h)
        z1 = self._linattn(y3, self.kv1(y1), b, self.h)
        z2 = self._linattn(y3, self.kv2(y2), b, self.h)
        o1 = self.e1(torch.cat([z1, v1], -1))
        o2 = self.e2(torch.cat([z2, v2], -1))
        return self.n1(x1 + o1), self.n2(x2 + o2)


class TorchDRDB(nn.Module):
    def __init__(self, ch, g):
        super().__init__()
        self.ch = ch
        convs = []
        c = ch
        for _ in range(5):
            convs.append(nn.Conv2d(c, g, 3, padding=2, dilation=2))
            c += g
        self.convs = nn.ModuleList(convs)
        self.out = nn.Conv2d(c, ch, 1)

    def forward(self, x):
        f = x
        for conv in self.convs:
            f = torch.cat([f, torch.relu(conv(f))], 1)
        return x + torch.relu(self.out(f))


# ----------------------------------------------------------------- tests ----

def test_sr_attention_parity():
    dim, heads, sr, H, W = 32, 2, 2, 8, 8
    oracle = TorchSRAttention(dim, heads, sr).eval()
    x = torch.randn(2, H * W, dim)
    with torch.no_grad():
        expect = oracle(x, H, W).numpy()

    sd = sd_numpy(oracle)
    params = {
        "q": {"kernel": _t(sd["q.weight"]), "bias": sd["q.bias"]},
        "kv": {"kernel": _t(sd["kv.weight"]), "bias": sd["kv.bias"]},
        "proj": {"kernel": _t(sd["proj.weight"]), "bias": sd["proj.bias"]},
        "sr": {"kernel": _conv(sd["sr_conv.weight"]), "bias": sd["sr_conv.bias"]},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    model = EfficientSelfAttention(dim, heads, sr)
    got = model.apply({"params": params}, jnp.asarray(x.numpy()), H, W)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)


def test_mixffn_parity():
    dim, hidden, H, W = 16, 64, 6, 5
    oracle = TorchMixFFN(dim, hidden).eval()
    x = torch.randn(2, H * W, dim)
    with torch.no_grad():
        expect = oracle(x, H, W).numpy()
    sd = sd_numpy(oracle)
    params = {
        "fc1": {"kernel": _t(sd["fc1.weight"]), "bias": sd["fc1.bias"]},
        "dwconv": {"kernel": _dwconv(sd["dw.weight"]), "bias": sd["dw.bias"]},
        "fc2": {"kernel": _t(sd["fc2.weight"]), "bias": sd["fc2.bias"]},
    }
    model = MixFFN(hidden, dim)
    got = model.apply({"params": params}, jnp.asarray(x.numpy()), H, W)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)


def test_patch_embed_parity():
    emb, patch, stride = 24, 7, 4
    conv = nn.Conv2d(3, emb, patch, stride=stride, padding=patch // 2)
    ln = nn.LayerNorm(emb)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        y = conv(x)
        h, w = y.shape[2:]
        expect = ln(y.flatten(2).transpose(1, 2)).numpy()
    params = {
        "proj": {"kernel": _conv(conv.weight.detach().numpy()),
                 "bias": conv.bias.detach().numpy()},
        "norm": {"scale": ln.weight.detach().numpy(),
                 "bias": ln.bias.detach().numpy()},
    }
    model = OverlapPatchEmbed(emb, patch, stride)
    got, gh, gw = model.apply({"params": params},
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert (gh, gw) == (h, w)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)


def test_crosspath_parity():
    dim, heads, n = 16, 4, 12
    oracle = TorchCrossPath(dim, heads).eval()
    x1 = torch.randn(2, n, dim)
    x2 = torch.randn(2, n, dim)
    seg = torch.randn(2, n, dim)
    with torch.no_grad():
        e1, e2 = oracle(x1, x2, seg)
    sd = sd_numpy(oracle)

    def dense(prefix):
        d = {"kernel": _t(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            d["bias"] = sd[f"{prefix}.bias"]
        return d

    params = {
        "channel_proj1": dense("p1"), "channel_proj2": dense("p2"),
        "channel_proj3": dense("p3"),
        "cross_attn": {"kv_seg": dense("kv3")},
        "cross_attn2": {"kv1": dense("kv1"), "kv2": dense("kv2")},
        "end_proj1": dense("e1"), "end_proj2": dense("e2"),
        "norm1": {"scale": sd["n1.weight"], "bias": sd["n1.bias"]},
        "norm2": {"scale": sd["n2.weight"], "bias": sd["n2.bias"]},
    }
    model = CrossPath(dim, heads)
    g1, g2 = model.apply({"params": params}, jnp.asarray(x1.numpy()),
                         jnp.asarray(x2.numpy()), jnp.asarray(seg.numpy()))
    np.testing.assert_allclose(np.asarray(g1), e1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g2), e2.numpy(), atol=2e-5)


def test_drdb_parity():
    ch, g = 16, 8
    oracle = TorchDRDB(ch, g).eval()
    x = torch.randn(1, ch, 9, 9)
    with torch.no_grad():
        expect = oracle(x).numpy()
    sd = sd_numpy(oracle)
    params = {}
    for i in range(5):
        _set(params, [f"dconv{i + 1}", "kernel"], _conv(sd[f"convs.{i}.weight"]))
        _set(params, [f"dconv{i + 1}", "bias"], sd[f"convs.{i}.bias"])
    _set(params, ["bottleneck", "kernel"], _conv(sd["out.weight"]))
    _set(params, ["bottleneck", "bias"], sd["out.bias"])
    model = DRDB(ch, g)
    got = model.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got), expect.transpose(0, 2, 3, 1), atol=2e-5)


def test_segformer_head_parity():
    """Head oracle: 4 linear projs -> bilinear upsample -> concat(c4..c1) ->
    1x1 conv -> BN(eval) -> relu -> 1x1 class conv."""
    dims = (8, 12, 16, 20)
    emb, ncls = 24, 9
    projs = nn.ModuleList([nn.Linear(d, emb) for d in dims])
    fuse = nn.Conv2d(4 * emb, emb, 1, bias=False)
    bn = nn.BatchNorm2d(emb).eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 1.5)
        bn.weight.normal_()
        bn.bias.normal_()
    pred = nn.Conv2d(emb, ncls, 1)
    feats_t = [torch.randn(1, d, 16 // 2**i, 16 // 2**i)
               for i, d in enumerate(dims)]
    with torch.no_grad():
        ups = []
        for i in (3, 2, 1, 0):
            f = feats_t[i]
            p = projs[i](f.flatten(2).transpose(1, 2))
            p = p.transpose(1, 2).reshape(1, emb, f.shape[2], f.shape[3])
            if i != 0:
                p = tF.interpolate(p, size=feats_t[0].shape[2:],
                                   mode="bilinear", align_corners=False)
            ups.append(p)
        x = fuse(torch.cat(ups, 1))
        x = torch.relu(bn(x))
        expect = pred(x).numpy()

    params = {}
    for i, p in enumerate(projs):
        _set(params, [f"linear_c{i + 1}", "kernel"], _t(p.weight.detach().numpy()))
        _set(params, [f"linear_c{i + 1}", "bias"], p.bias.detach().numpy())
    _set(params, ["linear_fuse", "kernel"], _conv(fuse.weight.detach().numpy()))
    _set(params, ["bn", "scale"], bn.weight.detach().numpy())
    _set(params, ["bn", "bias"], bn.bias.detach().numpy())
    _set(params, ["linear_pred", "kernel"], _conv(pred.weight.detach().numpy()))
    _set(params, ["linear_pred", "bias"], pred.bias.detach().numpy())
    stats = {"bn": {"mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()}}

    model = SegFormerHead(num_classes=ncls, embedding_dim=emb)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply({"params": params, "batch_stats": stats}, feats_j)
    np.testing.assert_allclose(np.asarray(got),
                               expect.transpose(0, 2, 3, 1), atol=3e-5)


def test_converter_key_mapping_roundtrip():
    """convert_mit_encoder + convert_segformer_head map reference-style keys
    onto trees whose leaves land in the right places."""
    sd = {
        "patch_embed1.proj.weight": np.zeros((8, 3, 7, 7), np.float32),
        "patch_embed1.proj.bias": np.zeros((8,), np.float32),
        "patch_embed1.norm.weight": np.ones((8,), np.float32),
        "patch_embed1.norm.bias": np.zeros((8,), np.float32),
        "block1.0.norm1.weight": np.ones((8,), np.float32),
        "block1.0.norm1.bias": np.zeros((8,), np.float32),
        "block1.0.attn.q.weight": np.zeros((8, 8), np.float32),
        "block1.0.attn.q.bias": np.zeros((8,), np.float32),
        "block1.0.attn.sr.weight": np.zeros((8, 8, 8, 8), np.float32),
        "block1.0.attn.sr.bias": np.zeros((8,), np.float32),
        "block1.0.mlp.dwconv.dwconv.weight": np.zeros((32, 1, 3, 3), np.float32),
        "block1.0.mlp.dwconv.dwconv.bias": np.zeros((32,), np.float32),
        "norm1.weight": np.ones((8,), np.float32),
        "norm1.bias": np.zeros((8,), np.float32),
    }
    p = convert_mit_encoder(sd)
    assert p["patch_embed1"]["proj"]["kernel"].shape == (7, 7, 3, 8)
    assert p["block1_0"]["attn"]["q"]["kernel"].shape == (8, 8)
    assert p["block1_0"]["attn"]["sr"]["kernel"].shape == (8, 8, 8, 8)
    assert p["block1_0"]["mlp"]["dwconv"]["kernel"].shape == (3, 3, 1, 32)
    assert "scale" in p["norm1"]

    hsd = {
        "linear_c4.proj.weight": np.zeros((24, 20), np.float32),
        "linear_c4.proj.bias": np.zeros((24,), np.float32),
        "linear_fuse.conv.weight": np.zeros((24, 96, 1, 1), np.float32),
        "linear_fuse.bn.weight": np.ones((24,), np.float32),
        "linear_fuse.bn.bias": np.zeros((24,), np.float32),
        "linear_fuse.bn.running_mean": np.zeros((24,), np.float32),
        "linear_fuse.bn.running_var": np.ones((24,), np.float32),
        "linear_pred.weight": np.zeros((9, 24, 1, 1), np.float32),
        "linear_pred.bias": np.zeros((9,), np.float32),
    }
    hp, hs = convert_segformer_head(hsd)
    assert hp["linear_c4"]["kernel"].shape == (20, 24)
    assert hp["linear_fuse"]["kernel"].shape == (1, 1, 96, 24)
    assert hs["bn"]["mean"].shape == (24,)
