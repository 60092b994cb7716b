"""H-halo-strip decomposition for full-resolution conv chains.

Measured on v5e (OPTIMIZATION.md): XLA's TPU conv enters a ~1.7x-faster
direct path when a plane is <= ~19k px; at 480x640 a conv pays im2col HBM
traffic instead. Cutting the batch into overlapping row strips (halo = the
chain's receptive reach) moves any conv chain into the fast regime at the
cost of (strip + 2*halo)/strip redundant compute.

Parity requirement (same as the phase-split DRDB): the reference zero-pads
every conv at the TRUE image border, so out-of-image halo rows must be
re-zeroed after each nonlinearity — `to_strips` returns the row mask; the
caller multiplies it in after every conv+activation whose output feeds
another spatial conv.

Used by models/fusion.py for the fusion tail (conv2 -> conv21 -> conv22,
reference model_fusion.py:1062-1066).
"""
from __future__ import annotations

import jax.numpy as jnp


def pick_strip(h: int, w: int, halo: int, max_plane: int = 42000):
    """Largest divisor of `h` whose halo-extended plane fits the fast
    regime; None if none does (caller falls back to the untiled path).
    max_plane default from the round-3 e18 in-context sweep of the fusion
    TAIL convs at 480x640 (strip 48): 132.7 ms core vs 134.6 at the old
    19500 cap (strip 24, 25% halo-row overcompute) vs 139.3 at 86000
    (strip 120, out of the fast conv regime). SEGMIF_AB=tail_max_plane
    overrides it (trace-time A/B knob: flipping after jit has no
    effect)."""
    import os

    from ..utils.ab import ab

    env = ab("tail_max_plane")
    if env:
        max_plane = int(env)
    best = None
    for s in range(8, h + 1):
        if h % s == 0 and (s + 2 * halo) * w <= max_plane:
            best = s
    return best


def to_strips(x: jnp.ndarray, strip: int, halo: int):
    """[B, H, W, C] -> ([n*B, strip+2*halo, W, C], row_mask [n, rows, 1, 1]
    broadcast over B). Strip-major along the new batch dim."""
    b, h, w, c = x.shape
    n = h // strip
    xpad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    xs = jnp.concatenate(
        [xpad[:, i * strip:i * strip + strip + 2 * halo] for i in range(n)],
        0)
    ridx = jnp.arange(strip + 2 * halo)[None, :] - halo
    gl = ridx + jnp.arange(n)[:, None] * strip
    ok = ((gl >= 0) & (gl < h)).astype(x.dtype)
    mask = jnp.repeat(ok, b, axis=0)[:, :, None, None]
    return xs, mask


def from_strips(ys: jnp.ndarray, batch: int, strip: int, halo: int):
    """Inverse of to_strips (drops halos, restitches along H)."""
    nb, rows, w, c = ys.shape
    n = nb // batch
    ys = ys[:, halo:halo + strip]
    ys = ys.reshape(n, batch, strip, w, c).transpose(1, 0, 2, 3, 4)
    return ys.reshape(batch, n * strip, w, c)
