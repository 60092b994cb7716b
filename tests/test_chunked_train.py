"""Chunked fusion training (train/steps.py::make_fusion_train_chunk) must
be ITER-FOR-ITER identical to the per-step Python loop: same rng folds,
same augment, same step math — only the dispatch granularity differs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmif_tpu.data.augment import AugConfig, augment_batch
from segmif_tpu.models.network import JointPipeline
from segmif_tpu.train.optimizer import adamw_poly
from segmif_tpu.train.state import FusionTrainState
from segmif_tpu.train.steps import (make_fusion_train_chunk,
                                    make_fusion_train_step)


@pytest.mark.parametrize(
    "round1",
    [pytest.param(True, marks=pytest.mark.slow), False])
# round1=True (the cheaper loss path) is slow-tier: each variant costs 4
# full train-step compiles on the 1-core CPU host (~200-240 s); the fast
# tier keeps the round>=2 variant, which exercises the richer path (CE
# through the frozen seg net + DWA) and all the chunk plumbing
def test_chunked_matches_loop(round1):
    b, h, w, k_sz = 2, 48, 64, 3
    crop = 32
    model = JointPipeline("mit_b0", num_classes=5, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    init_ir = jnp.zeros((1, crop, crop, 1))
    init_vis = jnp.zeros((1, crop, crop, 3))
    variables = model.init(rng, init_ir, init_vis)
    seg_vars = {"params": {"seg": variables["params"]["seg"]},
                "batch_stats": {"seg": variables.get(
                    "batch_stats", {}).get("seg", {})}}
    tx = adamw_poly(1e-3, 0, 100)
    aug = AugConfig(crop_size=crop, scale_min=1.0, scale_max=1.0,
                    ignore_index=255)

    gen = np.random.default_rng(7)
    raws = [{"ir": gen.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
             "vis": gen.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
             "guide": gen.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
             "label": gen.integers(0, 5, (b, h, w)).astype(np.int32)}
            for _ in range(k_sz)]
    base_rng = jax.random.PRNGKey(42)
    fusion_scale = jnp.float32(0.4)

    # reference: the per-iter loop
    step = jax.jit(make_fusion_train_step(model, tx, round1=round1))
    state = FusionTrainState.create(variables["params"]["fusion"], tx)
    loop_losses = []
    for n in range(k_sz):
        key = jax.random.fold_in(base_rng, n)
        r = raws[n]
        batch = augment_batch(key, jnp.asarray(r["ir"]),
                              jnp.asarray(r["vis"]), jnp.asarray(r["guide"]),
                              jnp.asarray(r["label"]), aug, 5)
        state, metrics = step(state, seg_vars, batch, fusion_scale)
        loop_losses.append(float(metrics["loss"]))

    # chunked: one compiled scan over the same raw batches
    chunk = jax.jit(make_fusion_train_chunk(model, tx, round1=round1,
                                            aug_cfg=aug, num_classes=5))
    state_c = FusionTrainState.create(variables["params"]["fusion"], tx)
    stacked = {f: np.stack([r[f] for r in raws])
               for f in ("ir", "vis", "guide", "label")}
    state_c, losses = chunk(state_c, seg_vars, stacked, base_rng,
                            jnp.int32(0), fusion_scale)

    np.testing.assert_allclose(np.asarray(losses, np.float32),
                               np.asarray(loop_losses, np.float32),
                               rtol=2e-4, atol=2e-5)
    # params: XLA fuses the scanned body differently from the standalone
    # step, so grads differ at reassociation level (~1e-7) and Adam's
    # u/(sqrt(v)+eps) amplifies that early (v ~ 0): measured max leaf diff
    # 7.5e-4 after 3 iters on the round>=2 path, most leaves at 1e-7. A
    # wrong rng fold or batch order would be O(1) — 2e-3 still catches any
    # mechanical bug.
    diffs = jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
        state.params, state_c.params)
    assert max(jax.tree.leaves(diffs)) < 2e-3
    assert int(state_c.step) == k_sz


@pytest.mark.parametrize(
    "round1",
    [True, pytest.param(False, marks=pytest.mark.slow)])
# the round>=2 variant adds ~180 s of compile on the 1-core host; the
# accumulation math (grad mean, micro scan, one update) is identical in
# both, so the fast tier keeps round1 and the slow tier guards the
# DWA-weighted path
def test_fusion_step_grad_accum_matches_big_batch(round1):
    """grad_accum=2 over two micro-batches of size B must produce the same
    optimizer update as one step over the concatenated 2B batch (all losses
    are batch-means; equal micro-batch sizes)."""
    b, h, w = 2, 32, 32
    model = JointPipeline("mit_b0", num_classes=5, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, h, w, 1)),
                           jnp.zeros((1, h, w, 3)))
    seg_vars = {"params": {"seg": variables["params"]["seg"]},
                "batch_stats": {"seg": variables.get(
                    "batch_stats", {}).get("seg", {})}}
    tx = adamw_poly(1e-3, 0, 100)
    fusion_scale = jnp.float32(0.4)

    gen = np.random.default_rng(3)
    big = {"ir": jnp.asarray(gen.uniform(0, 1, (2 * b, h, w, 1)),
                             jnp.float32),
           "vis": jnp.asarray(gen.uniform(0, 1, (2 * b, h, w, 3)),
                              jnp.float32),
           "guide": jnp.asarray(gen.uniform(0, 1, (2 * b, h, w, 3)),
                                jnp.float32),
           "label": jnp.asarray(gen.integers(0, 5, (2 * b, h, w)),
                                jnp.int32)}
    micro = {f: v.reshape((2, b) + v.shape[1:]) for f, v in big.items()}

    step_big = jax.jit(make_fusion_train_step(model, tx, round1=round1))
    step_acc = jax.jit(make_fusion_train_step(model, tx, round1=round1,
                                              grad_accum=2))
    s0 = FusionTrainState.create(variables["params"]["fusion"], tx)
    s_big, m_big = step_big(s0, seg_vars, big, fusion_scale)
    s_acc, m_acc = step_acc(s0, seg_vars, micro, fusion_scale)

    assert abs(float(m_big["loss"]) - float(m_acc["loss"])) < 1e-4
    diffs = jax.tree.map(lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
                         s_big.params, s_acc.params)
    assert max(jax.tree.leaves(diffs)) < 2e-3
    assert int(s_acc.step) == 1
