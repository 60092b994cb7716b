"""Training state pytrees.

One on-device state per phase, mirroring the reference's two checkpoints
(model-fusion_add_final2.pth = seg, modelfusion-final2.pth = fusion,
/root/reference/train.py:237-243,402-407) but holding optimizer state, step,
batch stats and the DWA loss buffer as well, so a restore resumes exactly.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from ..losses.dwa import DWAState, dwa_init


class SegTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


class FusionTrainState(struct.PyTreeNode):
    params: Any                      # fusion-network params (trainable)
    opt_state: Any
    dwa: DWAState
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), dwa=dwa_init(),
                   step=jnp.zeros((), jnp.int32))
