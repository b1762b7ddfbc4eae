"""Preemption-safe training: SIGTERM mid-epoch finishes the in-flight step,
saves the "last" checkpoint (weights + optimizer state) and stops cleanly —
the TPU-fleet upgrade over the reference's Lightning KeyboardInterrupt
teardown, which loses in-epoch progress. A second signal kills immediately
(not exercised here); handlers are restored after fit."""

import os
import signal

import jax
import numpy as np

from myria3d_tpu.callbacks.checkpoint_callbacks import ModelCheckpoint
from myria3d_tpu.train import Trainer, TrainerConfig

from tests.myria3d_tpu.test_trainer_parallel import FakeDataModule, _model


class KillerLogger:
    """Delivers SIGTERM to our own process on the first train/loss_step log
    (log cadence = every step), simulating a preemption notice mid-epoch."""

    def __init__(self):
        self.kills = 0

    def log_metrics(self, metrics, step=None):
        if "train/loss_step" in metrics and self.kills == 0:
            self.kills += 1
            os.kill(os.getpid(), signal.SIGTERM)


def test_sigterm_saves_last_checkpoint_and_stops(tmp_path):
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    model = _model()
    trainer = Trainer(
        TrainerConfig(max_epochs=5, limit_train_batches=2, limit_val_batches=1),
        callbacks={"model_checkpoint": ModelCheckpoint(dirpath=str(tmp_path / "ck"))},
        logger=KillerLogger(),
        seed=0,
    )
    state = trainer.fit(model, FakeDataModule())

    assert trainer.interrupted
    # stopped right after the in-flight step, not at epoch end (2 batches x
    # 5 epochs would be 10 steps)
    assert int(state.step) == 1
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) is prev_term
    assert signal.getsignal(signal.SIGINT) is prev_int
    # "last" checkpoint written and resumable with optimizer state intact
    # (restore_into_state is fit's ckpt_path resume path)
    last = trainer.checkpoint_cb.last_model_path
    assert last and os.path.isdir(last)
    fresh_model = _model()
    fresh = fresh_model.init_state(
        jax.random.PRNGKey(3), FakeDataModule().train_dataloader()[0].device_arrays()
    )
    restored = fresh_model.restore_into_state(last, fresh, restore_opt_state=True)
    assert int(restored.step) == 1
    np.testing.assert_array_equal(
        np.asarray(state.params["fc0"]["kernel"]),
        np.asarray(restored.params["fc0"]["kernel"]),
    )


def test_fit_task_skips_test_after_interrupt(tmp_path):
    """train()'s fit task must not run test-after-fit on a preempted run."""
    from myria3d_tpu.train import train  # noqa: F401 — import-time sanity

    model = _model()
    trainer = Trainer(
        TrainerConfig(max_epochs=3, limit_train_batches=2, limit_val_batches=1),
        callbacks={"model_checkpoint": ModelCheckpoint(dirpath=str(tmp_path / "ck"))},
        logger=KillerLogger(),
        seed=0,
    )
    trainer.fit(model, FakeDataModule())
    assert trainer.interrupted
    # best_model_path never set: no epoch completed, only the interrupt save
    assert trainer.checkpoint_cb.best_model_path is None
    assert trainer.checkpoint_cb.last_model_path is not None
