"""Trainer loop over the virtual multi-device CPU mesh (in-process).

Exercises auto_parallel device selection, replicated-state/sharded-batch
steps inside Trainer.fit/test, checkpointing, early stopping and metrics —
with a tiny in-memory datamodule so compiles stay cheap on the 1-core host.
"""

import jax
import numpy as np
import pytest

from myria3d_tpu.callbacks.checkpoint_callbacks import ModelCheckpoint
from myria3d_tpu.callbacks.metric_callbacks import ModelMetrics
from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from myria3d_tpu.pctl.batching import PointCloudBatch
from myria3d_tpu.train import Trainer, TrainerConfig

B, N, D_IN, C = 4, 256, 9, 7


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    return PointCloudBatch(
        pos=pos,
        x=rng.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
        y=rng.integers(0, C, (B, N)).astype(np.int32),
        mask=np.ones((B, N), bool),
        num_valid=np.full(B, N, np.int32),
        idx_in_original_cloud=[None] * B,
        copies=[{} for _ in range(B)],
    )


class FakeDataModule:
    batch_size = B

    def prepare_data(self, stage=None):
        pass

    def setup(self, stage=None):
        pass

    def train_dataloader(self, seed=None):
        return [_batch(0), _batch(1)]

    def val_dataloader(self):
        return [_batch(2)]

    def test_dataloader(self):
        return [_batch(3)]


def _model():
    return Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=8,
            decimation=4, return_logits=True,
        ),
        lr=0.01,
        criterion=CrossEntropyLoss(ignore_index=65),
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_fit_and_test_on_mesh(tmp_path):
    model = _model()
    trainer = Trainer(
        TrainerConfig(max_epochs=2, limit_train_batches=2, limit_val_batches=1),
        callbacks={
            "model_detailed_metrics": ModelMetrics(C),
            "model_checkpoint": ModelCheckpoint(dirpath=str(tmp_path / "ck")),
        },
        seed=0,
    )
    dm = FakeDataModule()
    state = trainer.fit(model, dm)
    assert trainer.par is not None  # 4 of the 8 virtual devices used
    assert trainer.par.mesh.devices.size == 4
    assert int(state.step) == 4  # 2 epochs x 2 batches
    # state is replicated across the mesh
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 4
    # checkpoint written and loss finite
    assert trainer.checkpoint_cb.best_model_path is not None

    out = trainer.test(model, dm, state=state)
    assert np.isfinite(out["test/loss_epoch"])
    assert "test/iou" in out


def test_single_device_fallback_when_batch_indivisible():
    from myria3d_tpu.parallel import auto_parallel

    model = _model()
    # batch of 1 has no divisor > 1
    assert auto_parallel(model, 1) is None
