"""RandLA-Net unit tests: shapes, masking invariance, edge-case clouds
(reference ``tests/myria3d/models/modules/test_randla_nets.py`` analog, plus
the mask-correctness tests the reference can't express).

All applies go through cached ``jax.jit`` wrappers — eager linen dispatch is
~30s/forward on CPU, jitted is ~10ms (+ one cached compile).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myria3d_tpu.models.modules import MODEL_ZOO, get_neural_net_class
from myria3d_tpu.models.modules.randla_net import RandLANet

D_IN = 9
NUM_CLASSES = 7


def _make_net(**kw):
    return RandLANet(num_features=D_IN, num_classes=NUM_CLASSES, **kw)


@functools.lru_cache(maxsize=None)
def _jitted(net):
    init = jax.jit(lambda r, x, p, m: net.init(r, x, p, m, train=False))
    apply_eval = jax.jit(
        lambda v, x, p, m, r: net.apply(
            v, x, p, m, train=False, rngs={"decimation": r}
        )
    )
    apply_train = jax.jit(
        lambda v, x, p, m, r1, r2: net.apply(
            v, x, p, m, train=True,
            rngs={"decimation": r1, "dropout": r2},
            mutable=["batch_stats"],
        )
    )
    return init, apply_eval, apply_train


def _init(net, x, pos, mask, seed=0):
    init, _, _ = _jitted(net)
    return init(
        {"params": jax.random.PRNGKey(seed), "decimation": jax.random.PRNGKey(1)},
        x, pos, mask,
    )


def _rand_batch(b=2, n=256, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (b, n, D_IN)).astype(np.float32)
    mask = np.ones((b, n), dtype=bool)
    if n_valid is not None:
        for i, nv in enumerate(n_valid):
            mask[i, nv:] = False
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def test_forward_shapes_and_finite():
    net = _make_net()
    x, pos, mask = _rand_batch()
    vs = _init(net, x, pos, mask)
    _, apply_eval, _ = _jitted(net)
    logits = apply_eval(vs, x, pos, mask, jax.random.PRNGKey(2))
    assert logits.shape == (2, 256, NUM_CLASSES)
    assert np.isfinite(np.asarray(logits)[np.asarray(mask)]).all()


def test_forward_variable_sizes_and_tiny_clouds():
    # reference test uses sizes [50, 50] where decimation could empty clouds
    net = _make_net()
    x, pos, mask = _rand_batch(b=2, n=256, n_valid=[50, 3])
    vs = _init(net, x, pos, mask)
    _, apply_eval, _ = _jitted(net)
    logits = apply_eval(vs, x, pos, mask, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(logits)[np.asarray(mask)]).all()


def test_mask_invariance_pad_values_dont_leak():
    """Garbage in pad slots must not change valid outputs (eval mode)."""
    net = _make_net()
    x, pos, mask = _rand_batch(b=2, n=256, n_valid=[150, 256])
    vs = _init(net, x, pos, mask)
    _, apply_eval, _ = _jitted(net)

    out1 = np.asarray(apply_eval(vs, x, pos, mask, jax.random.PRNGKey(7)))
    x2 = np.asarray(x).copy()
    p2 = np.asarray(pos).copy()
    m = np.asarray(mask)
    x2[~m] = 1e3
    p2[~m] = 77.7
    out2 = np.asarray(
        apply_eval(vs, jnp.asarray(x2), jnp.asarray(p2), mask, jax.random.PRNGKey(7))
    )
    np.testing.assert_allclose(out1[m], out2[m], rtol=1e-4, atol=1e-4)


def test_mask_invariance_train_mode_bn_stats():
    """Masked BN statistics must exclude pads in train mode too."""
    net = _make_net()
    x, pos, mask = _rand_batch(b=2, n=256, n_valid=[150, 256])
    vs = _init(net, x, pos, mask)
    _, _, apply_train = _jitted(net)

    def run(xa, pa):
        out, updates = apply_train(
            vs, xa, pa, mask, jax.random.PRNGKey(7), jax.random.PRNGKey(8)
        )
        return np.asarray(out), updates

    out1, up1 = run(x, pos)
    x2 = np.asarray(x).copy()
    p2 = np.asarray(pos).copy()
    m = np.asarray(mask)
    x2[~m] = -55.0
    p2[~m] = 123.0
    out2, up2 = run(jnp.asarray(x2), jnp.asarray(p2))
    np.testing.assert_allclose(out1[m], out2[m], rtol=1e-4, atol=1e-4)
    # running stats updates identical as well
    for a, b in zip(jax.tree_util.tree_leaves(up1), jax.tree_util.tree_leaves(up2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_gradients_flow():
    net = _make_net()
    x, pos, mask = _rand_batch(b=2, n=256)
    vs = _init(net, x, pos, mask)
    params, batch_stats = vs["params"], vs["batch_stats"]

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            logits, _ = net.apply(
                {"params": p, "batch_stats": batch_stats},
                x, pos, mask, train=True,
                rngs={"decimation": jax.random.PRNGKey(2),
                      "dropout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.where(mask[..., None], logits**2, 0.0))

        return jax.grad(loss_fn)(p)

    grads = grad_fn(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9


def test_remat_grads_match_baseline():
    """`remat=True` (jax.checkpoint over each residual block, for large-
    batch training HBM) must be a pure memory/compute trade: identical
    param tree and the same gradients as the un-rematted net."""
    net = _make_net()
    net_r = _make_net(remat=True)
    x, pos, mask = _rand_batch(b=2, n=256)
    vs = _init(net, x, pos, mask)
    vs_r = _init(net_r, x, pos, mask)
    assert jax.tree_util.tree_structure(vs["params"]) == \
        jax.tree_util.tree_structure(vs_r["params"])

    @functools.partial(jax.jit, static_argnums=0)
    def grad_fn(n, p, bs):
        def loss_fn(p):
            logits, _ = n.apply(
                {"params": p, "batch_stats": bs},
                x, pos, mask, train=True,
                rngs={"decimation": jax.random.PRNGKey(2),
                      "dropout": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.where(mask[..., None], logits**2, 0.0))

        return jax.grad(loss_fn)(p)

    g = grad_fn(net, vs["params"], vs["batch_stats"])
    g_r = grad_fn(net_r, vs["params"], vs["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g, g_r,
    )


def test_param_count_plausible():
    """Reference model is ~1-5M params (SURVEY.md §2.3)."""
    net = _make_net()
    x, pos, mask = _rand_batch(b=2, n=256)
    vs = _init(net, x, pos, mask)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(vs["params"]))
    assert 0.5e6 < n_params < 6e6, n_params


def test_return_log_softmax():
    net = _make_net(return_logits=False)
    x, pos, mask = _rand_batch(b=2, n=256)
    vs = _init(net, x, pos, mask)
    _, apply_eval, _ = _jitted(net)
    out = apply_eval(vs, x, pos, mask, jax.random.PRNGKey(2))
    probs = np.exp(np.asarray(out))
    np.testing.assert_allclose(probs.sum(-1)[np.asarray(mask)], 1.0, atol=1e-4)


def test_model_zoo_lookup():
    assert get_neural_net_class("RandLANet") is RandLANet
    assert get_neural_net_class("RandLA") is RandLANet  # substring match
    with pytest.raises(KeyError):
        get_neural_net_class("NoSuchNet")
    assert RandLANet in MODEL_ZOO
