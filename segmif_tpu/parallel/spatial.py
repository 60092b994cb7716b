"""Spatial (sequence) parallelism for the fusion network: 2-D image-grid
sharding with halo exchange.

The reference has no long-sequence mechanism beyond sr-attention
(SURVEY.md §5.7); for the 1080p/mit_b5 stretch config a single chip runs
out of HBM for the full-res fusion trunk. This module shards the image's
ROW dimension across the mesh's 'data' axis under shard_map:

 - convolutions see a halo of neighbor rows, exchanged with
   `jax.lax.ppermute` before the shard-local forward (ICI neighbor
   traffic only);
 - the hierarchical interactive attention is the O(N) "context vector"
   linear attention, whose context matrix  softmax(k^T v)  is a SUM over
   tokens — so the shard-local partial k^T v matrices are combined with a
   single `psum` and every shard applies the identical global context.
   This makes spatially-sharded attention EXACT, not an approximation.

`spatial_fuse` runs FusionNetwork's forward this way; each shard computes
its rows of the fused image. The seg branch stays data-parallel (its
sr-attention is not token-separable); this module covers the full-res
fusion trunk, which is where the memory pressure lives.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.pallas_drdb import drdb_apply
from ..kernels.pallas_ffm import (
    crosspath_folded_xla,
    folded_weights_from_params,
)

# Receptive-field halo of the fusion trunk up to a given point:
# conv1 (3x3, reach 1) + DRDB (5 dilated convs, reach 10) per round.
_HALO = 16  # covers conv1 + DRDB + DRDB after the FFM + final 3x3 chain


def _exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a row-sharded [rows_local, W, C] block with `halo` rows from each
    neighbor shard (zeros at the global edges)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]   # send my bottom rows down
    up = [(i, (i - 1) % n) for i in range(n)]     # send my top rows up
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    zeros = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def _crop_halo(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    return x[halo:x.shape[0] - halo]


def _conv(x, k, b=None, dilation=1):
    p = dilation * (k.shape[0] // 2)
    y = jax.lax.conv_general_dilated(
        x[None], k.astype(x.dtype), (1, 1), [(p, p), (p, p)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)



def _fusion_forward_sharded(params: Dict, ir, vis_y, tap1, tap2,
                            num_heads: int, axis_name: str,
                            true_h: int | None = None):
    """Shard-local FusionNetwork forward ([rows_local, W, ch] blocks).

    Convs run on halo-extended blocks (halo exchanged per interaction
    segment); the FFM attention psums its context. `true_h` (static) is the
    unpadded image height when the caller padded rows to divide the shard
    count — padding rows are treated as out-of-image by every conv mask and
    excluded from the attention grams."""
    alpha = params["prelu_alpha"]
    rows_local = ir.shape[0]
    n_shards = jax.lax.axis_size(axis_name)
    shard_idx = jax.lax.axis_index(axis_name)
    h_global = true_h if true_h is not None else rows_local * n_shards

    def block_valid_rows(halo: int):
        """(lo, hi) block-local bounds of the in-image rows for a
        halo-extended block — row r of the block is global row
        shard_idx*rows_local - halo + r; valid iff the global row is inside
        [0, h_global). drdb_apply re-zeroes outside this interval around
        every conv, the reference's zero padding at the true boundary."""
        g0 = shard_idx * rows_local - halo
        return -g0, h_global - g0

    def edge_mask(halo: int):
        """[rows_local+2*halo, 1, 1] in-image row indicator (tail convs)."""
        lo, hi = block_valid_rows(halo)
        r = jnp.arange(rows_local + 2 * halo)
        return ((r >= lo) & (r < hi)).astype(ir.dtype)[:, None, None]

    # DRDBs route through the SAME dispatcher as the model trunk
    # (kernels.pallas_drdb.drdb_apply): on TPU the phase-strip formulation,
    # elsewhere grouped XLA — with valid_rows standing in for the global
    # image boundary of this shard's halo-extended block.
    def trunk(x, conv_name, drdb_name):
        xh = _exchange_halo(x, _HALO, axis_name)
        y = _prelu(_conv(xh, params[conv_name]["kernel"],
                         params[conv_name]["bias"]), alpha)
        y = drdb_apply(y[None], params[drdb_name],
                       valid_rows=block_valid_rows(_HALO))[0]
        return _crop_halo(y, _HALO)

    x1 = trunk(ir[..., 0:1], "conv1_ir", "drdb1")
    x2 = trunk(vis_y[..., 0:1], "conv1_vis", "drdb2")

    def seg_proj(name, t):
        return _conv(t, params[name]["kernel"], params[name]["bias"])

    # the FFM rounds run the SAME folded CrossPath as the model
    # (kernels.pallas_ffm.crosspath_folded_xla): the gram partial sums are
    # psum'd over the shard axis so every shard applies the identical
    # GLOBAL attention context — exact, not an approximation. Pad rows are
    # dropped from the grams via token_weight; their (bias-only) output
    # rows are re-masked by the next conv's valid_rows.
    ffm_w = folded_weights_from_params(params["ffm"]["cross"])
    dim = ffm_w["we1"].shape[-1]
    scale = (dim // num_heads)**-0.5

    def ffm(x1, x2, s):
        tw = None
        if true_h is not None:
            rows_ok = (shard_idx * rows_local
                       + jnp.arange(rows_local)) < h_global
            tw = jnp.broadcast_to(rows_ok[None, :, None],
                                  (1,) + x1.shape[:2]).astype(x1.dtype)
        o1, o2 = crosspath_folded_xla(x1[None], x2[None], s[None], ffm_w,
                                      scale, num_heads, token_weight=tw,
                                      psum_axis=axis_name)
        return o1[0], o2[0]

    x1, x2 = ffm(x1, x2, seg_proj("seg_proj1", tap1))

    def drdb_h(x, name):
        xh = _exchange_halo(x, _HALO, axis_name)
        return _crop_halo(drdb_apply(
            xh[None], params[name],
            valid_rows=block_valid_rows(_HALO))[0], _HALO)

    x1 = drdb_h(x1, "drdb3")
    x2 = drdb_h(x2, "drdb4")
    x1, x2 = ffm(x1, x2, seg_proj("seg_proj2", tap2))

    y = jnp.concatenate([x1, x2], axis=-1)
    yh = _exchange_halo(y, 3, axis_name)
    m3 = edge_mask(3)
    # each conv's input is masked at out-of-image rows (the reference's
    # per-conv zero padding at the global boundary)
    y = _prelu(_conv(yh * m3, params["conv2"]["kernel"],
                     params["conv2"]["bias"]), alpha)
    y = _prelu(_conv(y * m3, params["conv21"]["kernel"],
                     params["conv21"]["bias"]), alpha)
    y = _prelu(_conv(y * m3, params["conv22"]["kernel"],
                     params["conv22"]["bias"]), alpha)
    return _crop_halo(y, 3)


def spatial_fuse(mesh: Mesh, params: Dict, ir, vis_y, tap1, tap2,
                 num_heads: int = 8, axis: str = "data"):
    """Run FusionNetwork's forward with the image rows sharded over `axis`.

    params: the FusionNetwork param dict (variables['params']['fusion']).
    ir/vis_y: [H, W, 1]; tap1: [H, W, 64]; tap2: [H, W, 128] (single image;
    use `spatial_fuse_batched` for batches). Any H — rows are zero-padded to
    a multiple of the shard count and the pad rows are masked out of every
    conv and attention gram, so the result equals the unsharded forward.
    Returns the fused Y [H, W, 1]. Exact (halo-exchanged convs + psum'd
    attention).
    """
    n = mesh.shape[axis]
    h = ir.shape[0]
    pad = (-h) % n
    # halo exchange is single-hop (ppermute to adjacent shards only)
    assert (h + pad) // n >= _HALO, (
        f"rows per shard {(h + pad) // n} < halo {_HALO}; "
        f"use fewer shards for H={h}")
    true_h = h if pad else None
    if pad:
        padfn = lambda t: jnp.pad(t, ((0, pad), (0, 0), (0, 0)))  # noqa: E731
        ir, vis_y, tap1, tap2 = map(padfn, (ir, vis_y, tap1, tap2))

    spec_in = P(axis, None, None)
    fn = jax.shard_map(
        functools.partial(_fusion_forward_sharded, num_heads=num_heads,
                          axis_name=axis, true_h=true_h),
        mesh=mesh,
        in_specs=(P(), spec_in, spec_in, spec_in, spec_in),
        out_specs=spec_in,
    )
    out = fn(params, ir, vis_y, tap1, tap2)
    return out[:h] if pad else out


def spatial_fuse_batched(mesh: Mesh, params: Dict, ir, vis_y, tap1, tap2,
                         num_heads: int = 8, axis: str = "data"):
    """Batched spatial_fuse: [B, H, W, C] inputs -> [B, H, W, 1] fused Y."""
    return jax.vmap(
        lambda a, b, c, d: spatial_fuse(mesh, params, a, b, c, d,
                                        num_heads=num_heads, axis=axis)
    )(ir, vis_y, tap1, tap2)


def make_spatial_fuse_fn(mesh: Mesh, model, axis: str = "data",
                         vis_channel: str = "r"):
    """The full test_fusion inference pipeline (JointPipeline.fuse
    semantics) with the fusion trunk row-sharded over `axis` — the 1080p/
    mit_b5 stretch path (SURVEY.md §5.7, configs/stretch_1080p.yaml).

    Returns fuse_fn(variables, ir_y [B,H,W,1], vis_rgb [B,H,W,3],
    guide_rgb [B,H,W,3]) -> (fused_rgb, fused_y), a drop-in replacement for
    train.steps.make_fuse_fn. The seg-encoder tap pass and the YCrCb
    recombine run unsharded (they fit; the full-res fusion trunk is where
    the memory pressure lives); the trunk runs via spatial_fuse_batched —
    exact, so outputs match the single-device fuse_fn to fp tolerance.
    """
    from ..models.network import JointPipeline
    from ..ops.color import recombine_fused, rgb_to_ycrcb

    def fuse_fn(variables, ir, vis_rgb, guide_rgb):
        taps = model.apply(variables, guide_rgb,
                           method=JointPipeline.guide_taps)
        tap1, tap2 = taps
        vis_ycrcb = rgb_to_ycrcb(vis_rgb)
        vis_in = (vis_rgb[..., 0:1] if vis_channel == "r"
                  else vis_ycrcb[..., 0:1])
        dtype = tap1.dtype
        fused_y = spatial_fuse_batched(
            mesh, variables["params"]["fusion"], ir.astype(dtype),
            vis_in.astype(dtype), tap1, tap2, axis=axis)
        fused_rgb = recombine_fused(fused_y.astype(jnp.float32),
                                    vis_ycrcb.astype(jnp.float32))
        return fused_rgb, fused_y

    return fuse_fn
