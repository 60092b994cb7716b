"""E15 (round 3): round-1 fusion-loss convergence probe on TPU — what lr /
iteration budget makes the synthetic 4-sample overfit drop its loss >5x
(tests/test_learning.py assertion #1, VERDICT round-2 next-step #3)?

The CPU probe managed one lr in ~27 min and showed 4e-4 stalling around
0.6-0.9 from a ~2.3 start with oscillation. This sweeps lrs x 600 iters in
minutes on the chip, f32 like the CPU test.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import _cache

_cache.enable()

from segmif_tpu.data.datasets import SyntheticFusionDataset  # noqa: E402
from segmif_tpu.models.network import JointPipeline  # noqa: E402
from segmif_tpu.train.optimizer import adamw_poly  # noqa: E402
from segmif_tpu.train.steps import (  # noqa: E402
    FusionTrainState, make_fusion_train_step)

ds = SyntheticFusionDataset(n=4, size=(64, 64))
names, irs, viss, gs, labs = zip(*[ds[i] for i in range(4)])


def _chan(a, c):
    a = np.stack(a).astype(np.float32) / 255.0
    if a.ndim == 3:
        a = a[..., None]
    if a.shape[-1] == 1 and c == 3:
        a = np.repeat(a, 3, -1)
    return jnp.asarray(a[..., :c])


batch = {
    "ir": _chan(irs, 1),
    "vis": _chan(viss, 3),
    "guide": _chan(gs, 3),
    "label": jnp.asarray(np.stack(labs), jnp.int32),
}

model = JointPipeline("mit_b0", num_classes=9, dtype=jnp.float32)
rng = jax.random.PRNGKey(0)
variables = model.init(rng, batch["ir"][:1], batch["vis"][:1])
seg_vars = {"params": {"seg": variables["params"]["seg"]},
            "batch_stats": {"seg": variables.get(
                "batch_stats", {}).get("seg", {})}}

for lr in (4e-4, 1e-3, 2e-3, 4e-3):
    tx = adamw_poly(lr, 0, 20000)
    state = FusionTrainState.create(variables["params"]["fusion"], tx)
    step = jax.jit(make_fusion_train_step(model, tx, round1=True))
    t0 = time.time()
    losses = []
    for i in range(600):
        state, m = step(state, seg_vars, batch, jnp.float32(0.4))
        if i < 20 or (i + 1) % 50 == 0:
            losses.append((i + 1, float(m["loss"])))
    head = np.mean([v for i, v in losses if i <= 20][:2])
    tail = [v for i, v in losses if i % 50 == 0]
    print(f"lr={lr}: head~{head:.3f} | " +
          " ".join(f"{i}:{v:.3f}" for i, v in losses if i % 50 == 0),
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    pass
