"""LR range test smoke (reference auto_lr_find, ``train.py:114-142``)."""

import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from myria3d_tpu.pctl.batching import PointCloudBatch
from myria3d_tpu.train import lr_range_test

B, N, D_IN, C = 2, 256, 9, 7


class TinyDataModule:
    batch_size = B

    def prepare_data(self, stage=None):
        pass

    def setup(self, stage=None):
        pass

    def train_dataloader(self, seed=None):
        rng = np.random.default_rng(seed or 0)
        pos = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
        return [
            PointCloudBatch(
                pos=pos,
                x=rng.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
                y=rng.integers(0, C, (B, N)).astype(np.int32),
                mask=np.ones((B, N), bool),
                num_valid=np.full(B, N, np.int32),
                idx_in_original_cloud=[None] * B,
                copies=[{} for _ in range(B)],
            )
        ]


def test_lr_range_suggests_positive_lr():
    model = Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=8,
            decimation=4, return_logits=True,
        ),
        lr=0.01,
        criterion=CrossEntropyLoss(ignore_index=65),
    )
    lr = lr_range_test(model, TinyDataModule(), num_steps=8, min_lr=1e-4,
                       max_lr=1.0)
    assert 1e-5 < lr < 10.0
    assert np.isfinite(lr)
