"""Checkpoint save/restore: exact fit-resume (optimizer moments) vs
weights-only finetune reload; load_from_checkpoint hparams round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model

B, N, D_IN, C = 2, 256, 9, 7


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


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.uniform(0, 1, (B, N, D_IN)).astype(np.float32)),
        "pos": jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, C, (B, N)).astype(np.int32)),
        "mask": jnp.ones((B, N), bool),
    }


def test_resume_restores_optimizer_moments(tmp_path):
    model = _model()
    b = _batch()
    state = model.init_state(jax.random.PRNGKey(0), b)
    for i in range(2):
        state, loss, _ = model.train_step(
            state, b["x"], b["pos"], b["y"], b["mask"], jax.random.PRNGKey(1)
        )
    model.raw_hparams = {
        "neural_net_class_name": "RandLANet",
        "neural_net_hparams": dict(model.neural_net_hparams),
        "lr": 0.01,
    }
    ckpt = model.save_checkpoint(str(tmp_path / "ck"), state)

    fresh = model.init_state(jax.random.PRNGKey(9), b)
    resumed = model.restore_into_state(ckpt, fresh, restore_opt_state=True)
    assert int(resumed.step) == 2
    # optimizer first moments carried over (non-zero after 2 steps)
    mu_saved = jax.tree_util.tree_leaves(state.opt_state)
    mu_resumed = jax.tree_util.tree_leaves(resumed.opt_state)
    assert any(float(jnp.abs(a).sum()) > 0 for a in mu_saved)
    for a, c in zip(mu_saved, mu_resumed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)

    # finetune semantics: weights restored, optimizer fresh (zeros)
    ft = model.restore_into_state(ckpt, fresh, restore_opt_state=False)
    for a, c in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(ft.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # bare reload from hparams (predict-time path)
    model2, state2 = Model.load_from_checkpoint(ckpt)
    assert model2.neural_net_hparams["num_neighbors"] == 8
    for a, c in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
