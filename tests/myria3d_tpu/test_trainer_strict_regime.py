"""Test-regime downgrade guard: ``Trainer.test`` falling back from the
full-cloud regime (reference task=test, ``myria3d/models/model.py:86-103``)
to subsampled-regime eval must warn loudly once per run, and
``predict.strict_full_cloud`` must turn it into a hard error."""

import logging

import numpy as np
import pytest

from myria3d_tpu.callbacks.metric_callbacks import ModelMetrics
from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from myria3d_tpu.pctl.batching import PointCloudBatch
from myria3d_tpu.train import Trainer, TrainerConfig

B, N, D_IN, C = 2, 256, 9, 7


def _batch_without_copies(seed=0):
    rng = np.random.default_rng(seed)
    return PointCloudBatch(
        pos=rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        x=rng.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
        y=rng.integers(0, C, (B, N)).astype(np.int32),
        mask=np.ones((B, N), bool),
        num_valid=np.full(B, N, np.int32),
        idx_in_original_cloud=[None] * B,
        copies=[{} for _ in range(B)],  # no Copy*Pos transforms ran
    )


class NoCopiesDataModule:
    batch_size = B

    def prepare_data(self, stage=None):
        pass

    def setup(self, stage=None):
        pass

    def test_dataloader(self):
        return [_batch_without_copies(0), _batch_without_copies(1)]


def _trainer(**kw):
    import jax

    model = Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=8,
            decimation=4, return_logits=True,
        ),
        lr=0.01,
        criterion=CrossEntropyLoss(ignore_index=65),
    )
    trainer = Trainer(
        TrainerConfig(devices=1, limit_test_batches=2),
        callbacks={"model_detailed_metrics": ModelMetrics(C)},
        seed=0,
    )
    dm = NoCopiesDataModule()
    state = model.init_state(
        jax.random.PRNGKey(0), _batch_without_copies().device_arrays()
    )
    return trainer, model, dm, state


def test_downgrade_warns_once_per_run():
    trainer, model, dm, state = _trainer()
    # the project logger sets propagate=False, so capture with a handler
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = logging.getLogger("myria3d_tpu.train")
    handler = Capture(level=logging.WARNING)
    logger.addHandler(handler)
    try:
        out = trainer.test(model, dm, state=state)
    finally:
        logger.removeHandler(handler)
    assert np.isfinite(out["test/loss_epoch"])
    warnings = [
        r for r in records if "SUBSAMPLED-regime" in r.getMessage()
    ]
    assert len(warnings) == 1  # two downgraded batches, ONE warning


def test_strict_full_cloud_raises():
    trainer, model, dm, state = _trainer()
    trainer.strict_full_cloud = True
    with pytest.raises(RuntimeError, match="strict_full_cloud"):
        trainer.test(model, dm, state=state)


def test_strict_flag_plumbs_from_config():
    from myria3d_tpu.train import TrainerConfig  # noqa: F401  (import check)
    from myria3d_tpu.utils.config import compose
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cfg = compose(
        os.path.join(repo_root, "configs"), "config.yaml",
        ["predict.strict_full_cloud=true"],
    )
    assert cfg["predict"]["strict_full_cloud"] is True
