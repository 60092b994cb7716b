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
