"""Jitted training steps for the two phases of interactive training.

The reference alternates train_fusion (/root/reference/train.py:266-413) and
train_seg (:115-245). Here each phase is ONE compiled XLA program:

 - seg_train_step: fused image + label -> CE on upsampled logits -> grouped
   AdamW update. BatchNorm stats and dropout/droppath rngs handled
   functionally.
 - fusion_train_step: IR + VIS + guide/target image + label -> fusion forward
   with frozen-seg feature taps -> round-1 (L1+Sobel) or round>=2
   (MSE+SSIM and CE through the frozen seg branch, combined by on-device
   DWA) -> AdamW update of the fusion params only. Gradients flow THROUGH
   the frozen seg network into the fused image, as in the reference
   (train.py:364-368), but no seg param is updated.

No .item() host syncs anywhere: losses are returned as device scalars and
the DWA buffer lives in the state (cf. the reference's per-step loss.item(),
train.py:370-371).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..losses.dwa import dwa_combine
from ..losses.fusion_losses import fusion_loss_l1_grad, fusion_loss_mse_ssim
from ..losses.seg_loss import cross_entropy
from ..ops.color import rgb_to_ycrcb, ycrcb_to_rgb
from ..ops.image import resize_bilinear
from .state import FusionTrainState, SegTrainState


def make_seg_train_step(model, tx, ignore_index: int = 255) -> Callable:
    """model: SegmentationNetwork. Returns step(state, batch, rng) ->
    (state, metrics). batch: {'image': [B,H,W,3] in [0,1], 'label': [B,H,W]}."""

    def step(state: SegTrainState, batch, rng):
        r_drop, r_path = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = model.apply(
                variables, batch["image"], False,
                rngs={"dropout": r_drop, "droppath": r_path},
                mutable=["batch_stats"])
            logits = resize_bilinear(logits.astype(jnp.float32),
                                     batch["label"].shape[1:3])
            loss = cross_entropy(logits, batch["label"], ignore_index)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss}

    return step


def make_fusion_train_step(joint_model, tx, round1: bool,
                           ignore_index: int = 255,
                           seg_scale: float = 0.8,
                           dwa_temperature: float = 1000.0,
                           dwa_warmup_steps: int = 10,
                           grad_accum: int = 1) -> Callable:
    """joint_model: JointPipeline. Returns
    step(state, seg_variables, batch, fusion_scale) -> (state, metrics).

    batch: {'ir': [B,H,W,1], 'vis': [B,H,W,3], 'guide': [B,H,W,3] (the Mask2
    image — fusion target AND seg-feature source), 'label': [B,H,W]}.
    fusion_scale: scalar array (0.4/round in the reference), passed as data
    so all rounds >=2 share one compiled program.

    grad_accum (A > 1): batch arrays carry a leading micro-batch dim
    [A, B, ...]; the step runs A fwd/bwd micro-passes under lax.scan,
    MEANS the gradients and losses, and applies ONE optimizer update —
    the effective batch A*B exceeds the per-chip activation ceiling
    (b16 fwd+bwd OOMs at 480x640 even with fusion-only remat: 22.02G vs
    15.75G, OPTIMIZATION.md round-4 addendum 7). Identical math to a
    single pass over the concatenated batch when every loss is a
    batch-mean and the micro-batches are equal-sized (pinned by
    tests/test_train.py::test_fusion_step_grad_accum_matches_big_batch).
    """

    def taps_fn(seg_variables, guide):
        # native-resolution taps: the fusion net projects them at encoder
        # res and upsamples straight into its trunk layout (same math as
        # the reference's full-res forward_fusion taps; models/fusion.py
        # tap_to_trunk)
        return joint_model.apply(
            seg_variables, guide, True,
            method=lambda m, g, det: m.seg.encode_taps_raw(g, det))

    def step(state: FusionTrainState, seg_variables, batch, fusion_scale):
        def loss_fn(params, mb):
            tap1, tap2 = taps_fn(seg_variables, mb["guide"])
            tap1 = jax.lax.stop_gradient(tap1)
            tap2 = jax.lax.stop_gradient(tap2)
            vis_ycrcb = rgb_to_ycrcb(mb["vis"])
            guide_y = rgb_to_ycrcb(mb["guide"])[..., 0:1]
            fused_y = joint_model.apply(
                {"params": {"fusion": params}}, mb["ir"],
                vis_ycrcb[..., 0:1], tap1, tap2,
                method=lambda m, a, b, c, d: m.fusion(a, b, c, d))
            if round1:
                loss = fusion_loss_l1_grad(mb["ir"], vis_ycrcb, fused_y,
                                           guide_y)
                return loss, (loss, jnp.zeros(()), jnp.ones((2,)))
            loss1 = fusion_loss_mse_ssim(mb["ir"], vis_ycrcb, fused_y,
                                         guide_y)
            # unclipped RGB recombination, as fed to Network3._loss
            # (train.py:363-368)
            fused_rgb = ycrcb_to_rgb(
                jnp.concatenate([fused_y, vis_ycrcb[..., 1:]], axis=-1))
            logits = joint_model.apply(
                seg_variables, fused_rgb, True,
                method=lambda m, x, det: m.seg(x, det))
            logits = resize_bilinear(logits.astype(jnp.float32),
                                     mb["label"].shape[1:3])
            loss2 = cross_entropy(logits, mb["label"], ignore_index)
            total, new_dwa, w = dwa_combine(
                state.dwa, loss1, loss2, fusion_scale, seg_scale,
                dwa_temperature, dwa_warmup_steps)
            del new_dwa  # state update happens outside the grad
            return total, (loss1, loss2, w)

        if grad_accum > 1:
            # micro-batch scan: mean of grads == grad of the concat batch
            # (all losses are batch-means; equal micro-batch sizes)
            def body(carry, mb):
                gsum, tsum, l1sum, l2sum = carry
                (tot, (l1, l2, w)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, mb)
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (gsum, tsum + tot, l1sum + l1, l2sum + l2), w

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, tot, l1s, l2s), ws = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.float32(0),
                       jnp.float32(0)), batch)
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, gsum)
            total, loss1, loss2 = tot * inv, l1s * inv, l2s * inv
            w = jax.tree.map(lambda x: x[0], ws)
        else:
            (total, (loss1, loss2, w)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        _, new_dwa, _ = dwa_combine(state.dwa, loss1, loss2, fusion_scale,
                                    seg_scale, dwa_temperature,
                                    dwa_warmup_steps)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  dwa=new_dwa, step=state.step + 1)
        return new_state, {"loss": total, "loss_fusion": loss1,
                           "loss_seg": loss2, "weights": w}

    return step


def make_fusion_train_chunk(joint_model, tx, round1: bool, aug_cfg,
                            num_classes: int, **step_kw) -> Callable:
    """K fusion train iters (augment + step) as ONE compiled lax.scan.

    Returns chunk(state, seg_variables, raws, base_rng, iter0,
    fusion_scale) -> (state, losses [K]) where raws is a dict of
    [K, B, ...] RAW (un-augmented) batches. Math is identical to K calls
    of the per-iter loop: iteration n uses fold_in(base_rng, n) exactly
    like train_fusion_phase's Python loop, and the same
    make_fusion_train_step underneath. The win is dispatch amortization:
    one host->device round-trip per K iters instead of per iter (the
    reference's loop is one dispatch per torch op; train.py:338-390).
    """
    from ..data.augment import augment_batch

    step = make_fusion_train_step(joint_model, tx, round1, **step_kw)

    def chunk(state, seg_variables, raws, base_rng, iter0, fusion_scale):
        k_sz = next(iter(raws.values())).shape[0]

        def body(st, inp):
            n, raw = inp
            key = jax.random.fold_in(base_rng, n)
            batch = augment_batch(key, raw["ir"], raw["vis"], raw["guide"],
                                  raw["label"], aug_cfg, num_classes)
            st, metrics = step(st, seg_variables, batch, fusion_scale)
            return st, metrics["loss"]

        ns = iter0 + jnp.arange(k_sz, dtype=jnp.int32)
        return jax.lax.scan(body, state, (ns, raws))

    return chunk


def make_fuse_fn(joint_model) -> Callable:
    """Jittable inference: (variables, ir, vis, guide) ->
    (fused_rgb clipped [0,1], fused_y). The test_fusion.py pipeline
    (/root/reference/test_fusion.py:100-111) as one graph."""

    def fuse(variables, ir, vis, guide):
        return joint_model.apply(variables, ir, vis, guide, True,
                                 method=joint_model.fuse)

    return fuse


def make_segment_fn(joint_model) -> Callable:
    """Jittable inference: (variables, rgb01, out_hw) -> per-pixel class ids
    (argmax of logits upsampled to out_hw), the val_segformer inner loop
    (/root/reference/val_performance.py:236-256)."""

    def segment(variables, rgb01):
        logits = joint_model.apply(variables, rgb01, True,
                                   method=lambda m, x, det: m.seg(x, det))
        logits = resize_bilinear(logits.astype(jnp.float32), rgb01.shape[1:3])
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return segment
