"""Mixed-precision compute (``model.neural_net_hparams.dtype: bfloat16``).

TPU-first training option the torch reference doesn't have (it trains
f32, the torch default — our default too, for checkpoint parity): the
net computes edge tensors/matmuls in bf16 while params, BN statistics
(f32 moments in ``MaskedBatchNorm``) and the classification head/logits
stay f32. These tests pin the invariants that make a bf16 run safe:
f32 state, f32 logits, finite losses, and a functional train step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.criterion import CrossEntropyLoss
from myria3d_tpu.models.model import Model
from myria3d_tpu.models.modules.randla_net import RandLANet

B, N, D_IN, C = 2, 256, 9, 7


def _model(dtype):
    return Model(
        neural_net_class_name="RandLANet",
        neural_net_hparams=dict(
            num_features=D_IN, num_classes=C, num_neighbors=8,
            decimation=4, return_logits=True, dtype=dtype,
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


def test_dtype_string_normalized_and_state_stays_f32():
    m = _model("bfloat16")
    assert m.net.dtype == jnp.bfloat16  # string knob -> jnp dtype
    state = m.init_state(jax.random.PRNGKey(0), _batch())
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert leaf.dtype == jnp.float32


def test_bf16_train_step_functional_and_f32_logits():
    m = _model("bfloat16")
    b = _batch()
    state = m.init_state(jax.random.PRNGKey(0), b)
    # the jitted step donates `state` — snapshot before stepping
    params_before = [
        np.asarray(p) for p in jax.tree_util.tree_leaves(state.params)
    ]
    rng = jax.random.PRNGKey(3)
    new_state, loss, logits = m.train_step(
        state, b["x"], b["pos"], b["y"], b["mask"], rng
    )
    assert logits.dtype == jnp.float32  # head pinned f32
    assert np.isfinite(float(loss))
    params_after = [
        np.asarray(p) for p in jax.tree_util.tree_leaves(new_state.params)
    ]
    for leaf in params_after:
        assert leaf.dtype == np.float32
    # params actually moved
    assert any(
        not np.allclose(a, b_) for a, b_ in zip(params_before, params_after)
    )


def test_bf16_forward_close_to_f32():
    """Same params, bf16 vs f32 compute: decisions should broadly agree
    on a random init (sanity bound, not a parity claim)."""
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, N, D_IN)), jnp.float32
    )
    pos = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (B, N, 3)), jnp.float32
    )
    mask = jnp.ones((B, N), bool)
    net32 = RandLANet(num_features=D_IN, num_classes=C, num_neighbors=8)
    net16 = RandLANet(
        num_features=D_IN, num_classes=C, num_neighbors=8,
        dtype=jnp.bfloat16,
    )
    rngs = {"params": jax.random.PRNGKey(0), "decimation": jax.random.PRNGKey(1)}
    vs = jax.jit(lambda r, a, p, m: net32.init(r, a, p, m, train=False))(
        rngs, x, pos, mask
    )
    r = jax.random.PRNGKey(2)
    lo32 = jax.jit(
        lambda v, a, p, m: net32.apply(v, a, p, m, train=False,
                                       rngs={"decimation": r})
    )(vs, x, pos, mask)
    lo16 = jax.jit(
        lambda v, a, p, m: net16.apply(v, a, p, m, train=False,
                                       rngs={"decimation": r})
    )(vs, x, pos, mask)
    assert lo16.dtype == jnp.float32
    agree = float(
        (np.asarray(lo32).argmax(-1) == np.asarray(lo16).argmax(-1)).mean()
    )
    assert agree > 0.9, agree
