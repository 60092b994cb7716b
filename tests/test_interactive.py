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
    result = tiny_trainer.run()
    assert "best_mIoU" in result
    assert len(tiny_trainer.history) >= 2
    # fused handoff replaced the guides in memory
    assert tiny_trainer.train_data.guide.dtype == np.uint8
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
