"""Dynamic task weighting (DWA-style), fully on-device.

The reference keeps a host-side (2, T) loss buffer and calls .item() on
every step (/root/reference/train.py:362-380) — a device->host sync per
iteration. Here the buffer lives in the training state as a device array
and the weighting math stays inside the jitted step:

    w_i = loss[t-1] / loss[t-2]
    weights = 2 * softmax(w_i / temperature)
    total = weights[0] * loss_fusion * fusion_scale
          + weights[1] * loss_seg * seg_scale

For the first `warmup_steps` steps (reference: n_iter <= 10) the static
scales are used without softmax reweighting.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DWAState(NamedTuple):
    """Rolling last-two losses per task: [2 tasks, 2 history slots]."""
    prev: jnp.ndarray   # losses at t-1, shape [2]
    prev2: jnp.ndarray  # losses at t-2, shape [2]
    step: jnp.ndarray   # scalar int32


def dwa_init() -> DWAState:
    return DWAState(prev=jnp.ones((2,), jnp.float32),
                    prev2=jnp.ones((2,), jnp.float32),
                    step=jnp.zeros((), jnp.int32))


def dwa_combine(state: DWAState, loss_fusion: jnp.ndarray,
                loss_seg: jnp.ndarray, fusion_scale: float, seg_scale: float,
                temperature: float = 1000.0, warmup_steps: int = 10):
    """Returns (total_loss, new_state, weights[2])."""
    w_i = state.prev / jnp.maximum(state.prev2, 1e-12)
    weights = 2.0 * jax.nn.softmax(w_i / temperature)
    static = jnp.array([1.0, 1.0], jnp.float32)
    use_dwa = state.step > warmup_steps
    w = jnp.where(use_dwa, weights, static)
    total = w[0] * loss_fusion * fusion_scale + w[1] * loss_seg * seg_scale
    new = DWAState(
        prev=jnp.stack([loss_fusion, loss_seg]).astype(jnp.float32),
        prev2=state.prev,
        step=state.step + 1,
    )
    return total, new, w
