"""End-to-end smoke test of the interactive trainer on tiny synthetic data."""
import numpy as np
import pytest

from segmif_tpu.config import (
    DataConfig,
    FusionPhaseConfig,
    SegPhaseConfig,
    TrainConfig,
)
from segmif_tpu.data import SyntheticFusionDataset
from segmif_tpu.train.interactive import InteractiveTrainer

pytestmark = pytest.mark.slow  # full train rounds: minutes even at mit_b0


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    cfg = TrainConfig(
        backbone="mit_b0",
        rounds=2,
        log_iters=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")),
        compute_dtype="float32",
        data=DataConfig(num_classes=9, crop_size=32),
        fusion=FusionPhaseConfig(iters_round1=3, iters_later=2, batch_size=2,
                                 crop_size=32, checkpoint_every=100,
                                 dwa_warmup_steps=1),
        seg=SegPhaseConfig(iters=3, batch_size=2, eval_every=100),
        mesh_data=2,
    )
    train_ds = SyntheticFusionDataset(n=4, size=(64, 64))
    val_ds = SyntheticFusionDataset(n=2, size=(64, 64), seed=1)
    return InteractiveTrainer(cfg, train_ds, val_ds)


def test_interactive_two_rounds(tiny_trainer):
    guide_before = tiny_trainer.train_data.guide.copy()
    result = tiny_trainer.run()
    assert "best_mIoU" in result
    assert len(tiny_trainer.history) >= 2
    # the STATIC guide (fusion target, reference Mask2/) must survive both
    # rounds unchanged — the round-2 fusion phase trains against the same
    # target as round 1 (/root/reference/train.py:20-21,346)
    np.testing.assert_array_equal(tiny_trainer.train_data.guide, guide_before)
    # while the regenerated fused images (reference Mask/) did change
    assert tiny_trainer.train_data.fused.dtype == np.uint8
    assert not np.array_equal(tiny_trainer.train_data.fused, guide_before)
    # and the seg phase sees the fused image in slot 3
    view = tiny_trainer.train_data.seg_view()
    np.testing.assert_array_equal(
        view[0][3], tiny_trainer.train_data.fused[0].astype(np.float32))
    for h in tiny_trainer.history:
        assert 0.0 <= h["mIoU"] <= 1.0


def _resume_cfg(ckpt_dir):
    return TrainConfig(
        backbone="mit_b0",
        rounds=1,
        log_iters=100,
        checkpoint_dir=str(ckpt_dir),
        compute_dtype="float32",
        data=DataConfig(num_classes=9, crop_size=32),
        fusion=FusionPhaseConfig(iters_round1=5, iters_later=2, batch_size=2,
                                 crop_size=32, checkpoint_every=2,
                                 dwa_warmup_steps=1),
        seg=SegPhaseConfig(iters=3, batch_size=2, eval_every=100),
        mesh_data=1,
    )


def test_midphase_resume_matches_uninterrupted(tmp_path):
    """A fusion phase killed at iter k and resumed from its full-train-state
    checkpoint reproduces the uninterrupted trajectory exactly (params,
    optimizer moments, DWA buffer, data order, rng) — VERDICT round-2 #5."""
    import jax

    train_ds = SyntheticFusionDataset(n=4, size=(64, 64))
    val_ds = SyntheticFusionDataset(n=2, size=(64, 64), seed=1)

    # uninterrupted run
    t_a = InteractiveTrainer(_resume_cfg(tmp_path / "a"), train_ds, val_ds)
    t_a.train_fusion_phase(1)
    ref_params = jax.tree.map(np.asarray, t_a.params["fusion"])

    # interrupted run: crash right after the iter-2 mid-phase save
    t_b = InteractiveTrainer(_resume_cfg(tmp_path / "b"), train_ds, val_ds)
    orig_save = t_b._save_phase

    def crash_after_save(role, round_idx, state):
        orig_save(role, round_idx, state)
        raise RuntimeError("simulated crash")

    t_b._save_phase = crash_after_save
    with pytest.raises(RuntimeError, match="simulated crash"):
        t_b.train_fusion_phase(1)
    assert (tmp_path / "b" / "fusion_phase_r1").exists()

    # fresh process: a new trainer over the same checkpoint_dir resumes at
    # iter 2 and finishes the phase
    t_c = InteractiveTrainer(_resume_cfg(tmp_path / "b"), train_ds, val_ds)
    t_c.train_fusion_phase(1)
    res_params = jax.tree.map(np.asarray, t_c.params["fusion"])
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_res = jax.tree_util.tree_leaves(res_params)
    for a, b in zip(flat_ref, flat_res):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
    # phase completion clears the mid-phase checkpoint
    assert not (tmp_path / "b" / "fusion_phase_r1").exists()


def test_run_resumes_from_progress(tmp_path):
    """run() skips phases recorded as complete in progress.json."""
    train_ds = SyntheticFusionDataset(n=4, size=(64, 64))
    val_ds = SyntheticFusionDataset(n=2, size=(64, 64), seed=1)
    t = InteractiveTrainer(_resume_cfg(tmp_path / "p"), train_ds, val_ds)
    calls = []
    t.train_fusion_phase = lambda r: calls.append(("fusion", r))
    t.train_seg_phase = lambda r: calls.append(("seg", r))
    t.regenerate_fused = lambda r: calls.append(("regen", r))
    # simulate: round-1 fusion phase already done
    t._mark_progress(1, "seg")
    t.save_checkpoint("fusion")
    t.save_checkpoint("seg")
    t.run()
    assert ("fusion", 1) not in calls
    assert ("seg", 1) in calls
    prog = t.read_progress()
    assert prog["next_round"] == 2 and prog["next_phase"] == "fusion"


def test_checkpoint_roundtrip(tiny_trainer):
    import jax.numpy as jnp

    before = jnp.asarray(
        tiny_trainer.params["fusion"]["conv22"]["bias"]).copy()
    tiny_trainer.save_checkpoint("fusion")
    tiny_trainer.save_checkpoint("seg")
    # perturb then restore
    tiny_trainer.params["fusion"]["conv22"]["bias"] = before + 1.0
    tiny_trainer.load_checkpoints()
    after = np.asarray(tiny_trainer.params["fusion"]["conv22"]["bias"])
    np.testing.assert_allclose(after, np.asarray(before), atol=1e-7)


def test_streaming_trainer_folder_dataset(tmp_path):
    """TrainConfig.streaming: the trainer runs off a FOLDER dataset with no
    whole-split RAM stacking (_stack_dataset never called); the regenerated
    fused images live in a disk memmap and feed the seg phase + eval
    (VERDICT round-2 #7)."""
    import numpy as np

    from segmif_tpu.data.datasets import (
        FusionFolderDataset,
        SyntheticFusionDataset,
    )
    from segmif_tpu.eval.image_io import save_png
    from segmif_tpu.train import interactive as ia

    root = tmp_path / "data"
    src = SyntheticFusionDataset(n=4, size=(64, 64))
    for i in range(len(src)):
        n, ir, vis, g, lab = src[i]
        for d, a in (("Infrared", ir), ("Visible", vis), ("Mask2", g),
                     ("Label", lab)):
            save_png(root / d / n, a.astype(np.uint8))
    train_ds = FusionFolderDataset(root)
    val_ds = FusionFolderDataset(root)

    cfg = _resume_cfg(tmp_path / "ck")
    cfg.streaming = True

    def boom(*a, **k):
        raise AssertionError("_stack_dataset called on the streaming path")

    orig = ia._stack_dataset
    ia._stack_dataset = boom
    try:
        t = InteractiveTrainer(cfg, train_ds, val_ds)
        result = t.run()
    finally:
        ia._stack_dataset = orig
    assert 0.0 <= result["best_mIoU"] <= 1.0
    # the fused handoff is a disk memmap, refreshed by regenerate_fused
    assert (tmp_path / "ck" / "fused_train.u8").exists()
    assert t.train_data.fused.shape == (4, 64, 64, 3)
    assert t.train_data.fused.dtype == np.uint8
