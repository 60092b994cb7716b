"""SegFormer all-MLP decode head in Flax (NHWC).

Re-design of /root/reference/core/segformer_head.py:27-82: per-stage linear
projection to the embedding dim, bilinear upsample of stages 2-4 to 1/4
resolution, channel concat in [c4, c3, c2, c1] order, 1x1 conv + BatchNorm +
ReLU fuse (the reference's mmcv ConvModule), dropout(0.1), and a 1x1 class
conv. In NHWC the per-stage "MLP" is a plain Dense over the channel axis —
no flatten/transpose plumbing needed.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_bilinear

_DENSE_INIT = nn.initializers.truncated_normal(stddev=0.02)
_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class SegFormerHead(nn.Module):
    num_classes: int
    embedding_dim: int = 256
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        """features: [c1, c2, c3, c4] NHWC. Returns logits at 1/4 res, NHWC."""
        c1, c2, c3, c4 = features
        tgt = c1.shape[1:3]
        proj = []
        # reference concatenates in c4..c1 order (segformer_head.py:76)
        for i, c in ((4, c4), (3, c3), (2, c2), (1, c1)):
            p = nn.Dense(self.embedding_dim, kernel_init=_DENSE_INIT,
                         dtype=self.dtype, name=f"linear_c{i}")(c)
            if p.shape[1:3] != tgt:
                p = resize_bilinear(p, tgt)
            proj.append(p)
        x = jnp.concatenate(proj, axis=-1)
        x = nn.Conv(self.embedding_dim, (1, 1), use_bias=False,
                    kernel_init=_CONV_INIT, dtype=self.dtype,
                    name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=_CONV_INIT,
                    dtype=self.dtype, name="linear_pred")(x)
        return x
