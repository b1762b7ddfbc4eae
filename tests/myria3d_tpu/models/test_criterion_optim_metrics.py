"""Unit tests: masked CE loss vs torch semantics, LR controllers, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myria3d_tpu.callbacks.metric_callbacks import (
    ModelMetrics,
    metrics_from_confusion_matrix,
)
from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.optimizers import (
    OneCycleLR,
    ReduceLROnPlateau,
    adam,
    current_learning_rate,
    set_learning_rate_scale,
)


def _torch_ce(logits, targets, ignore_index=65, weight=None, label_smoothing=0.0):
    import torch

    crit = torch.nn.CrossEntropyLoss(
        ignore_index=ignore_index,
        weight=None if weight is None else torch.tensor(weight),
        label_smoothing=label_smoothing,
    )
    return float(
        crit(torch.tensor(np.asarray(logits)).reshape(-1, logits.shape[-1]),
             torch.tensor(np.asarray(targets)).reshape(-1).long())
    )


def test_ce_matches_torch_with_ignore_index():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 50, 7)).astype(np.float32)
    targets = rng.integers(0, 7, (2, 50)).astype(np.int32)
    targets[0, :20] = 65  # ignored (pads/artefacts)
    ours = float(CrossEntropyLoss()(jnp.asarray(logits), jnp.asarray(targets)))
    ref = _torch_ce(logits, targets)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_weighted_ce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(1, 64, 5)).astype(np.float32)
    targets = rng.integers(0, 5, (1, 64)).astype(np.int32)
    w = [0.25, 0.1, 0.5, 2.0, 1.0]
    ours = float(
        CrossEntropyLoss(weight=w, ignore_index=65)(
            jnp.asarray(logits), jnp.asarray(targets)
        )
    )
    ref = _torch_ce(logits, targets, weight=w)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_ce_label_smoothing_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 32, 4)).astype(np.float32)
    targets = rng.integers(0, 4, (1, 32)).astype(np.int32)
    ours = float(
        CrossEntropyLoss(label_smoothing=0.1)(
            jnp.asarray(logits), jnp.asarray(targets)
        )
    )
    ref = _torch_ce(logits, targets, label_smoothing=0.1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ce_all_ignored_is_finite():
    logits = jnp.zeros((1, 8, 3))
    targets = jnp.full((1, 8), 65, jnp.int32)
    assert np.isfinite(float(CrossEntropyLoss()(logits, targets)))


def test_injected_lr_rewrite():
    tx = adam(lr=0.1)
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    assert abs(current_learning_rate(st) - 0.1) < 1e-7
    set_learning_rate_scale(st, 0.1, 0.5)
    assert abs(current_learning_rate(st) - 0.05) < 1e-7
    # MultiSteps wrapping still reachable
    mtx = optax.MultiSteps(adam(lr=0.2), every_k_schedule=2)
    mst = mtx.init(params)
    set_learning_rate_scale(mst, 0.2, 0.25)
    assert abs(current_learning_rate(mst) - 0.05) < 1e-7


def test_reduce_lr_on_plateau():
    sch = ReduceLROnPlateau(factor=0.5, patience=2, cooldown=0)
    scales = [sch.step(1.0) for _ in range(6)]  # flat metric
    # best=1.0 at step1; bad epochs accumulate; one halving after patience
    assert scales[-1] == 0.5
    assert sch.step(0.1) == 0.5  # improvement: no further decay
    assert sch.step(0.5) == 0.5


def test_one_cycle_shape():
    sch = OneCycleLR(epochs=2, steps_per_epoch=50, pct_start=0.3,
                     div_factor=10, final_div_factor=100)
    s0 = sch.scale_at(0)
    assert abs(s0 - 0.1) < 1e-6
    assert abs(sch.scale_at(30) - 1.0) < 1e-6   # peak at pct_start
    assert sch.scale_at(100) < 2e-3              # annealed to ~initial/100
    assert sch.per_step


def test_one_cycle_optax_schedule_matches_host_scale():
    """The fused device-side schedule must trace the host object's curve
    exactly (the host object is only kept for LR-monitor display)."""
    sch = OneCycleLR(epochs=2, steps_per_epoch=50, pct_start=0.3,
                     div_factor=10, final_div_factor=1000)
    f = sch.optax_schedule()
    for t in (0, 5, 15, 30, 50, 80, 99, 100):
        np.testing.assert_allclose(float(f(t)), sch.scale_at(t), rtol=1e-5,
                                   atol=1e-7)


def test_per_step_schedule_fused_into_optimizer():
    """A Model built with a OneCycle factory folds it into the optimizer:
    two steps with identical grads produce different update magnitudes
    (the schedule scales on device, no host LR writes)."""
    import jax
    import jax.numpy as jnp

    from myria3d_tpu.models.model import Model

    model = Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(num_features=3, num_classes=2,
                                num_neighbors=4, decimation=4,
                                return_logits=True),
        lr=0.01,
        lr_scheduler=lambda: OneCycleLR(epochs=1, steps_per_epoch=10,
                                        pct_start=0.3, div_factor=10,
                                        final_div_factor=100),
    )
    assert model.per_step_schedule_fused
    params = {"w": jnp.ones(3)}
    opt_state = model.tx.init(params)
    grads = {"w": jnp.ones(3)}
    sch = OneCycleLR(epochs=1, steps_per_epoch=10, pct_start=0.3,
                     div_factor=10, final_div_factor=100)
    for t in range(3):
        updates, opt_state = model.tx.update(grads, opt_state, params)
        got = float(jnp.abs(updates["w"][0]))
        want = 0.01 * sch.scale_at(t)  # adam dir magnitude 1 for const grads
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_metrics_from_cm():
    cm = np.array([[5, 1], [2, 8]], dtype=float)
    m = metrics_from_confusion_matrix(cm, {0: "a", 1: "b"}, prefix="val/")
    np.testing.assert_allclose(m["val/acc"], 13 / 16)
    np.testing.assert_allclose(m["val/iou/a"], 5 / 8)
    np.testing.assert_allclose(m["val/iou/b"], 8 / 11)
    np.testing.assert_allclose(m["val/iou"], (5 / 8 + 8 / 11) / 2)
    np.testing.assert_allclose(m["val/precision/a"], 5 / 7)
    np.testing.assert_allclose(m["val/recall/a"], 5 / 6)


def test_model_metrics_accumulation_and_masking():
    mm = ModelMetrics(3, {1: "ground", 2: "veg", 5: "building"})
    logits = jnp.asarray(
        [[[9.0, 0, 0], [0, 9, 0], [0, 0, 9], [9, 0, 0]]]
    )  # preds: 0,1,2,0
    targets = jnp.asarray([[0, 1, 1, 0]])
    mask = jnp.asarray([[True, True, True, False]])  # last excluded
    mm.update("val", logits, targets, mask)
    mm.update("val", logits, targets, mask)
    cm = mm.confusion_matrix("val")
    assert cm.sum() == 6  # 3 counted x 2 updates
    out = mm.compute_and_reset("val")
    np.testing.assert_allclose(out["val/acc"], 4 / 6)
    assert "val/iou/ground" in out
    assert mm.confusion_matrix("val").sum() == 0  # reset
