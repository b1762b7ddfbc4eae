"""Trainer loop over the virtual multi-device CPU mesh (in-process).

Exercises auto_parallel device selection, replicated-state/sharded-batch
steps inside Trainer.fit/test, checkpointing, early stopping and metrics —
with a tiny in-memory datamodule so compiles stay cheap on the 1-core host.
"""

import jax
import jax.numpy as jnp
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


def test_fit_calls_code_and_logs_path_hooks(tmp_path):
    """Loggers exposing log_code/log_logs_path are invoked at train start
    (reference LogCode/LogLogsPath callbacks, comet_callbacks.py:42-60)."""

    class RecordingLogger:
        def __init__(self):
            self.calls = []

        def log_metrics(self, metrics, step=None):
            pass

        def log_code(self, root):
            self.calls.append(("code", root))

        def log_logs_path(self, path):
            self.calls.append(("logs_path", path))

    logger = RecordingLogger()
    trainer = Trainer(
        TrainerConfig(max_epochs=1, limit_train_batches=1, limit_val_batches=1),
        logger=logger, seed=0,
    )
    trainer.fit(_model(), FakeDataModule())
    kinds = [k for k, _ in logger.calls]
    assert "code" in kinds and "logs_path" in kinds
    code_root = dict(logger.calls)["code"]
    assert code_root.endswith("myria3d_tpu")


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_interp_step_on_mesh_matches_single_device():
    """sharded_interp_step (shard_map) must equal the single-device
    interp_step on the same inputs — data-parallel predict correctness."""
    from myria3d_tpu.parallel import (
        make_mesh,
        replicate_to_mesh,
        shard_batch,
        sharded_interp_step,
    )

    model = _model()
    rng = np.random.default_rng(5)
    m_full = 512
    batch = _batch(4)
    state = model.init_state(jax.random.PRNGKey(0), batch.device_arrays())
    full_pos = rng.uniform(-1, 1, (B, m_full, 3)).astype(np.float32)
    full_mask = np.ones((B, m_full), bool)
    full_mask[:, 480:] = False
    key = jax.random.PRNGKey(3)

    # per-shard reference: with a 4-device mesh each device owns one row,
    # so the sharded step must equal single-device runs on each row alone
    # (same rng key, same local shapes → same decimation noise)
    ref = np.concatenate([
        np.asarray(model.interp_step(
            state, batch.x[i:i + 1], batch.pos[i:i + 1], batch.mask[i:i + 1],
            batch.pos[i:i + 1], full_pos[i:i + 1], full_mask[i:i + 1], key,
        ))
        for i in range(B)
    ])

    mesh = make_mesh(4)
    pstate = replicate_to_mesh(state, mesh)
    arrays = shard_batch(
        {"x": batch.x, "pos": batch.pos, "mask": batch.mask,
         "sampled_pos": batch.pos, "full_pos": full_pos,
         "full_mask": full_mask}, mesh,
    )
    out = np.asarray(sharded_interp_step(model, mesh)(
        pstate, arrays["x"], arrays["pos"], arrays["mask"],
        arrays["sampled_pos"], arrays["full_pos"], arrays["full_mask"], key,
    ))
    assert out.shape == (B, m_full, C)
    # same rng stream + batch-parallel step → identical logits
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # the exact-interpolation variant (predict.exact_interpolation) must
    # wire up on the mesh too; on CPU both take the f32 dense path, so the
    # outputs agree exactly
    from myria3d_tpu.parallel.mesh import ParallelSteps

    par = ParallelSteps(model, mesh)
    out_exact = np.asarray(par.exact_interp_step(
        pstate, arrays["x"], arrays["pos"], arrays["mask"],
        arrays["sampled_pos"], arrays["full_pos"], arrays["full_mask"], key,
    ))
    np.testing.assert_allclose(out_exact, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs a multi-device mesh")
def test_local_bn_step_matches_per_shard_reference():
    """sync_bn=False reproduces reference DDP semantics exactly: per-shard
    forward/backward (BN moments on the local batch), pmean'd grads/stats,
    one shared optimizer update — verified against a manual per-slice
    computation; and it diverges from the sync-BN (global-moment) step."""
    import optax

    from myria3d_tpu.parallel import (
        make_mesh,
        replicate_to_mesh,
        shard_batch,
        sharded_train_step,
    )

    model = _model()
    batch = _batch(7)
    # make per-shard feature distributions differ so BN mode matters
    batch.x[0] += 3.0
    batch.x[2] -= 2.0
    state = model.init_state(jax.random.PRNGKey(0), batch.device_arrays())
    key = jax.random.PRNGKey(9)

    # manual reference: per-slice grad step (local b=1 == per-shard local
    # batch on a 4-device mesh), mean-reduced, one optimizer update
    grad_step = jax.jit(model.build_grad_step())
    per = [
        grad_step(state, batch.x[i:i + 1], batch.pos[i:i + 1],
                  batch.y[i:i + 1], batch.mask[i:i + 1], key)
        for i in range(B)
    ]
    mean = lambda trees: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: sum(xs) / len(xs), *trees)
    ref_grads = mean([p[1] for p in per])
    ref_stats = mean([p[2] for p in per])
    updates, _ = model.tx.update(ref_grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    mesh = make_mesh(4)
    # place both copies BEFORE the donating step: device_put may alias the
    # source buffers, and train steps donate their state argument
    pstate = replicate_to_mesh(jax.tree_util.tree_map(jnp.copy, state), mesh)
    pstate2 = replicate_to_mesh(jax.tree_util.tree_map(jnp.copy, state), mesh)
    arrays = shard_batch(batch.device_arrays(), mesh)
    local_step = sharded_train_step(model, mesh, sync_bn=False)
    new_state, loss, logits = local_step(
        pstate, arrays["x"], arrays["pos"], arrays["y"], arrays["mask"], key,
    )
    assert np.isfinite(float(loss))
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                    jax.tree_util.tree_leaves(new_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)

    # sync-BN computes moments over the global batch → different stats
    sync_step = sharded_train_step(model, mesh, sync_bn=True)
    sync_state, _, _ = sync_step(
        pstate2, arrays["x"], arrays["pos"], arrays["y"], arrays["mask"], key,
    )
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(sync_state.batch_stats),
                        jax.tree_util.tree_leaves(new_state.batch_stats))
    ]
    assert max(diffs) > 1e-4, "sync and local BN unexpectedly identical"


def test_single_device_fallback_when_batch_indivisible():
    from myria3d_tpu.parallel import auto_parallel

    model = _model()
    # batch of 1 has no divisor > 1
    assert auto_parallel(model, 1) is None
