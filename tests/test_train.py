import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from segmif_tpu.losses import (
    cross_entropy,
    dwa_combine,
    dwa_init,
    fusion_loss_l1_grad,
    fusion_loss_mse_ssim,
    laplacian_pyramid_max_l1,
)
from segmif_tpu.train.optimizer import (
    adamw_poly,
    adamw_poly_grouped,
    poly_warmup_schedule,
    seg_param_labels,
)

KEY = jax.random.PRNGKey(0)


def test_poly_warmup_schedule_values():
    s = poly_warmup_schedule(1.0, warmup_iter=10, max_iter=100,
                             warmup_ratio=0.1, power=1.0)
    # at t=0: 1 - (1-0)*(1-0.1) = 0.1
    assert abs(float(s(0)) - 0.1) < 1e-6
    # end of warmup ramps toward 1
    assert float(s(9)) > 0.9
    # poly decay afterwards
    assert abs(float(s(50)) - 0.5) < 1e-6
    assert float(s(99)) < 0.02
    # resume offset
    s2 = poly_warmup_schedule(1.0, 10, 100, 0.1, 1.0, start_step=50)
    assert abs(float(s2(0)) - 0.5) < 1e-6


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.array([[[0, 255], [255, 255]]])
    loss = cross_entropy(logits, labels)
    # uniform logits -> -log(1/3) on the single valid pixel
    assert abs(float(loss) - np.log(3.0)) < 1e-4


def test_cross_entropy_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 4, 4))
    labels[0, 0, 0] = 255
    expect = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), ignore_index=255).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - expect) < 1e-4


def test_dwa_warmup_then_reweight():
    st = dwa_init()
    l1 = jnp.asarray(1.0)
    l2 = jnp.asarray(2.0)
    total, st, w = dwa_combine(st, l1, l2, fusion_scale=0.4, seg_scale=0.8)
    # during warmup, static weights 1.0
    assert abs(float(total) - (0.4 * 1.0 + 0.8 * 2.0)) < 1e-6
    for _ in range(12):
        total, st, w = dwa_combine(st, l1, l2, 0.4, 0.8)
    # equal loss ratios -> softmax uniform -> weights = 2*0.5 = 1.0
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0], atol=1e-5)
    assert int(st.step) == 13


def test_fusion_losses_zero_at_identity(rng):
    img = jnp.asarray(rng.uniform(0.2, 0.8, (1, 32, 32, 1)).astype(np.float32))
    mask3 = jnp.tile(img, (1, 1, 1, 3))
    l = fusion_loss_l1_grad(img, mask3, img, mask3)
    assert float(l) < 1e-6
    l2 = fusion_loss_mse_ssim(img, mask3, img, mask3)
    assert float(l2) < 1e-3  # SSIM(identity) ~ 1
    l3 = laplacian_pyramid_max_l1(img, img, img)
    assert float(l3) >= 0.0


def test_seg_param_labels_grouping():
    params = {
        "seg": {
            "encoder": {
                "block1_0": {"attn": {"q": {"kernel": jnp.zeros((4, 4)),
                                            "bias": jnp.zeros(4)},
                             "norm1": {"scale": jnp.ones(4)}}},
                "norm1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
            },
            "decoder": {"linear_pred": {"kernel": jnp.zeros((1, 1, 4, 2))}},
            "classifier": {"kernel": jnp.zeros((1, 1, 4, 2))},
        }
    }
    labels = seg_param_labels(params)
    enc = labels["seg"]["encoder"]
    assert enc["block1_0"]["attn"]["q"]["kernel"] == "encoder"
    assert enc["block1_0"]["attn"]["q"]["bias"] == "encoder_norm"  # bias: wd=0
    assert enc["norm1"]["scale"] == "encoder_norm"
    assert labels["seg"]["decoder"]["linear_pred"]["kernel"] == "decoder"
    assert labels["seg"]["classifier"]["kernel"] == "decoder"


def test_adamw_poly_step_decreases_loss():
    params = {"w": jnp.asarray(2.0)}
    tx = adamw_poly(0.1, warmup_iter=0, max_iter=1000)
    opt_state = tx.init(params)

    def loss_fn(p):
        return (p["w"] - 1.0) ** 2

    for _ in range(50):
        g = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert abs(float(params["w"]) - 1.0) < 0.2


def test_adamw_poly_grouped_runs():
    params = {"seg": {"encoder": {"norm1": {"scale": jnp.ones(3)}},
                      "decoder": {"k": {"kernel": jnp.ones((2, 2))}}}}
    tx = adamw_poly_grouped(params, 1e-3, 10, 100)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, st = tx.update(g, st, params)
    chex_shapes = jax.tree.map(lambda u, p: u.shape == p.shape, updates, params)
    assert all(jax.tree.leaves(chex_shapes))


@pytest.mark.slow
def test_remat_model_gradients_match():
    """remat=True recomputes the same math: loss and grads identical."""
    import jax
    from segmif_tpu.models.network import JointPipeline

    rng = np.random.default_rng(5)
    ir = jnp.asarray(rng.uniform(size=(1, 32, 32, 1)).astype(np.float32))
    vis = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    m0 = JointPipeline("mit_b0", num_classes=9)
    m1 = JointPipeline("mit_b0", num_classes=9, remat=True)
    v = m0.init(jax.random.PRNGKey(0), ir, vis)

    def loss(model, params):
        fused_rgb, fused_y, logits = model.apply(
            {"params": params, **{k: v[k] for k in v if k != "params"}},
            ir, vis)
        return (jnp.mean(fused_y ** 2)
                + jnp.mean(jax.nn.logsumexp(logits, -1)))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g0, g1)  # recompute
    # reassociation noise only
