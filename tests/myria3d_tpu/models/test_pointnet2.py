"""PointNet++ zoo-swap tests: forward shapes, masking, registry."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.modules import get_neural_net_class
from myria3d_tpu.models.modules.pointnet2 import PointNet2

D_IN = 9
NUM_CLASSES = 7


@functools.lru_cache(maxsize=None)
def _jitted(net):
    init = jax.jit(lambda r, x, p, m: net.init(r, x, p, m, train=False))
    apply_eval = jax.jit(
        lambda v, x, p, m: net.apply(v, x, p, m, train=False)
    )
    return init, apply_eval


def _rand_batch(b=2, n=256, seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (b, n, D_IN)).astype(np.float32)
    mask = np.ones((b, n), dtype=bool)
    if n_valid is not None:
        for i, nv in enumerate(n_valid):
            mask[i, nv:] = False
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def test_zoo_swap():
    assert get_neural_net_class("PointNet2") is PointNet2


def test_forward_shapes_and_mask_invariance():
    net = PointNet2(num_features=D_IN, num_classes=NUM_CLASSES)
    x, pos, mask = _rand_batch(b=2, n=256, n_valid=[150, 256])
    init, apply_eval = _jitted(net)
    vs = init({"params": jax.random.PRNGKey(0)}, x, pos, mask)
    logits = apply_eval(vs, x, pos, mask)
    assert logits.shape == (2, 256, NUM_CLASSES)
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(logits)[m]).all()

    # pad garbage must not leak into valid outputs
    x2, p2 = np.asarray(x).copy(), np.asarray(pos).copy()
    x2[~m] = 999.0
    p2[~m] = -777.0
    logits2 = apply_eval(vs, jnp.asarray(x2), jnp.asarray(p2), mask)
    np.testing.assert_allclose(
        np.asarray(logits)[m], np.asarray(logits2)[m], rtol=1e-4, atol=1e-4
    )


def test_gradients_flow():
    net = PointNet2(num_features=D_IN, num_classes=NUM_CLASSES)
    x, pos, mask = _rand_batch(b=2, n=256)
    init, _ = _jitted(net)
    vs = init({"params": jax.random.PRNGKey(0)}, x, pos, mask)

    @jax.jit
    def grad_fn(p):
        def loss_fn(p):
            out, _ = net.apply(
                {"params": p, "batch_stats": vs["batch_stats"]},
                x, pos, mask, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.where(mask[..., None], out**2, 0.0))

        return jax.grad(loss_fn)(p)

    grads = grad_fn(vs["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.8
