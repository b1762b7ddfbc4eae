"""predict.exact_knn plumbing: the fully-exact parity forward
(VERDICT r3 weak #3 — ``knn(exact=True)`` existed but reached no config).

Reference parity target: torch_cluster kNN is exact everywhere
(``myria3d/models/modules/pyg_randla_net.py:14,180``)."""

import jax
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
        "x": rng.uniform(0, 1, (B, N, D_IN)).astype(np.float32),
        "pos": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "y": rng.integers(0, C, (B, N)).astype(np.int32),
        "mask": np.ones((B, N), bool),
    }


def test_set_exact_knn_rebuilds_net_and_drops_jit_cache():
    model = _model()
    assert model.net.exact_knn is False and model.exact_knn is False
    _ = model.eval_step  # populate the jit cache
    assert model._jitted
    model.set_exact_knn(True)
    assert model.net.exact_knn is True and model.exact_knn is True
    assert model.neural_net_hparams["exact_knn"] is True
    assert not model._jitted  # stale traces dropped
    model.set_exact_knn(False)
    assert model.net.exact_knn is False


def test_exact_forward_matches_on_cpu():
    """On CPU approx_min_k lowers to an exact sort, so the exact and
    default forwards agree — this pins the plumbing (params stay valid
    across the net rebuild), not the kernel difference (TPU-only)."""
    model = _model()
    batch = _batch()
    state = model.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(2)
    loss_a, logits_a = model.eval_step(
        state, batch["x"], batch["pos"], batch["y"], batch["mask"], key
    )
    model.set_exact_knn(True)
    loss_e, logits_e = model.eval_step(
        state, batch["x"], batch["pos"], batch["y"], batch["mask"], key
    )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_e), rtol=1e-4, atol=1e-5
    )


def test_exact_knn_config_knob_composes():
    import os

    from myria3d_tpu.utils.config import compose

    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ))
    cfg = compose(
        os.path.join(repo_root, "configs"), "config.yaml",
        ["predict.exact_knn=true"],
    )
    assert cfg["predict"]["exact_knn"] is True
    assert cfg["predict"]["exact_interpolation"] is False  # orthogonal knobs
