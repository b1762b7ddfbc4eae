"""MaskedBatchNorm vs torch.nn.BatchNorm1d — exact semantics parity.

Feeding torch BN the concatenated *valid* rows must match our masked BN on
the padded batch: normalization (biased batch var), running-stat updates
(momentum 0.01, unbiased var), and eval mode using running stats.
"""

import jax
import jax.numpy as jnp
import numpy as np

from myria3d_tpu.models.modules.nn import MaskedBatchNorm


def _run_ours(x, valid, train, n_steps=1):
    bn = MaskedBatchNorm(x.shape[-1])
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid), False)
    params, stats = variables["params"], variables["batch_stats"]
    out = None
    for _ in range(n_steps):
        out, updates = bn.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), jnp.asarray(valid), train,
            mutable=["batch_stats"],
        )
        if train:
            stats = updates["batch_stats"]
    return np.asarray(out), jax.device_get(stats)


def test_train_mode_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    B, N, C = 3, 120, 6
    x = rng.normal(1.5, 2.0, (B, N, C)).astype(np.float32)
    valid = rng.random((B, N)) < 0.7

    ours, stats = _run_ours(x, valid, train=True)

    tbn = torch.nn.BatchNorm1d(C, momentum=0.01, eps=1e-6)
    flat = torch.tensor(x[valid])
    ref = tbn(flat).detach().numpy()
    np.testing.assert_allclose(ours[valid], ref, rtol=2e-4, atol=2e-5)
    # running stats after one step
    np.testing.assert_allclose(
        stats["mean"], tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        stats["var"], tbn.running_var.numpy(), rtol=1e-4, atol=1e-6
    )


def test_eval_mode_uses_running_stats():
    import torch

    rng = np.random.default_rng(1)
    B, N, C = 2, 80, 4
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    valid = np.ones((B, N), bool)

    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid), False)
    # drive a couple of train steps to move the running stats
    stats = variables["batch_stats"]
    tbn = torch.nn.BatchNorm1d(C, momentum=0.01, eps=1e-6)
    for step in range(3):
        xs = rng.normal(2.0, 3.0, (B, N, C)).astype(np.float32)
        _, updates = bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(xs), jnp.asarray(valid), True, mutable=["batch_stats"],
        )
        stats = updates["batch_stats"]
        tbn(torch.tensor(xs.reshape(-1, C)))

    tbn.eval()
    ours = np.asarray(
        bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), jnp.asarray(valid), False,
        )
    )
    ref = tbn(torch.tensor(x.reshape(-1, C))).detach().numpy().reshape(B, N, C)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_bn_momentum_configurable_through_the_net():
    """neural_net_hparams.bn_momentum threads to every BatchNorm."""
    import jax
    import jax.numpy as jnp
    from myria3d_tpu.models.modules.randla_net import RandLANet

    rng = np.random.default_rng(0)
    net = RandLANet(num_features=9, num_classes=7, num_neighbors=8,
                    bn_momentum=0.5)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 9)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32))
    mask = jnp.ones((1, 256), bool)
    vs = jax.jit(lambda r, *a: net.init(r, *a, train=False))(
        {"params": jax.random.PRNGKey(0), "decimation": jax.random.PRNGKey(1)},
        x, pos, mask,
    )
    _, updates = jax.jit(
        lambda v, *a: net.apply(
            v, *a, train=True,
            rngs={"decimation": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
    )(vs, x, pos, mask)
    # running mean moves half-way (momentum 0.5) from 0 toward the batch
    # mean; with momentum 0.01 it would move 50x less
    stats = updates["batch_stats"]["block1"]["shortcut"]["MaskedBatchNorm_0"]
    moved = float(jnp.abs(np.asarray(stats["mean"])).max())
    assert moved > 1e-3, moved
