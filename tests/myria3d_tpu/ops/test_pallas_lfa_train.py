"""Fused train-mode LFA (interpret mode): forward, BN batch moments, and
the hand-written VJP vs an XLA reference of the same math.

Inputs are chosen bf16-hi/lo-exact (positions on a 1/256 grid, features
rounded to bf16) so the kernel's payload quantization is lossless and
agreement is up to f32 summation order only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myria3d_tpu.ops.pallas_lfa_train as plt_mod
from myria3d_tpu.models.modules.nn import BN_EPS, LRELU_SLOPE
from myria3d_tpu.ops.knn import _augment_keys, _augment_queries
from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

B, N, K, C = 2, 1024, 8, 16
C2 = C // 2
WINDOW, BINS, TILE_Q = 1024, 512, 256


def _batch(seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pos = np.stack([
        rng.integers(0, 12800, (B, N)) / 256.0,
        rng.integers(0, 12800, (B, N)) / 256.0,
        rng.integers(0, 768, (B, N)) / 256.0,
    ], axis=-1).astype(np.float32)
    pos = np.take_along_axis(pos, np.argsort(pos[..., 0:1], axis=1), axis=1)
    mask = np.ones((B, N), bool)
    if n_valid is not None:
        for b, nv in enumerate(n_valid):
            mask[b, nv:] = False
            pos[b, nv:] = pos[b, 0]
    x = rng.uniform(-1, 1, (B, N, C2)).astype(np.float32)
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def _graph(pos, mask):
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)
    off = (
        jnp.sum(jnp.where(mask[..., None], pos, 0.0), axis=1)
        / cnt[..., None].astype(pos.dtype)
    )[:, None, :]
    q4 = _augment_queries(pos - off)
    k4 = _augment_keys(pos - off, mask)
    idx, d2 = knn_topk_pallas(
        q4, k4, K, tile_q=TILE_Q, bins=BINS, window=WINDOW,
        interpret=True, query_mask=mask,
    )
    nv = (d2 < 0.25e8) & mask[:, :, None]
    return jnp.where(nv, idx, 0), nv


def _params(seed=1):
    rng = np.random.default_rng(seed)
    w_e = jnp.asarray(rng.normal(0, 0.3, (10, C2)).astype(np.float32))
    b_e = jnp.asarray(rng.normal(0, 0.2, (C2,)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (C2,)).astype(np.float32))
    beta = jnp.asarray(rng.normal(0, 0.2, (C2,)).astype(np.float32))
    att_t = jnp.asarray(rng.normal(0, 0.3, (C, C)).astype(np.float32))
    return w_e, b_e, gamma, beta, att_t


def _reference(x, pos, mask, idx, nv, w_e, b_e, gamma, beta, att_t):
    """The unfused math (block + LocalFeatureAggregation train branch),
    with the kernel's zero-at-invalid gather semantics."""
    idx_t = jnp.swapaxes(idx, 1, 2)                        # (B, K, N)
    nv_t = jnp.swapaxes(nv, 1, 2)
    vm = nv_t[:, None].astype(jnp.float32)                 # (B, 1, K, N)
    pos_cf = jnp.swapaxes(pos, 1, 2)
    pos_j = jax.vmap(lambda t, i: t[:, i])(pos_cf, idx_t) * vm
    pos_i = pos_cf[:, :, None, :]
    diff = pos_j - pos_i
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(diff * diff, axis=1, keepdims=True), 0.0))
    rel = jnp.concatenate(
        [jnp.broadcast_to(pos_i, pos_j.shape), pos_j, diff, dist], axis=1
    )                                                      # (B, 10, K, N)
    e = jnp.einsum("io,bikn->bokn", w_e, rel) + b_e[None, :, None, None]
    n_valid = jnp.maximum(jnp.sum(vm), 1.0)
    mu = jnp.sum(e * vm, axis=(0, 2, 3)) / n_valid
    var = jnp.sum(
        (e - mu[None, :, None, None]) ** 2 * vm, axis=(0, 2, 3)
    ) / n_valid
    e_hat = (e - mu[None, :, None, None]) * jax.lax.rsqrt(
        var[None, :, None, None] + BN_EPS
    )
    u = gamma[None, :, None, None] * e_hat + beta[None, :, None, None]
    z = jnp.where(u >= 0.0, u, LRELU_SLOPE * u)
    x_cf = jnp.swapaxes(x, 1, 2)
    x_j = jax.vmap(lambda t, i: t[:, i])(x_cf, idx_t) * vm
    lf = jnp.concatenate([x_j, z], axis=1)                 # (B, C, K, N)
    att = jnp.einsum("oc,bckn->bokn", att_t, lf)
    neg = jnp.where(nv_t[:, None], att, -3e38)
    mx = jnp.max(neg, axis=2, keepdims=True)
    ex = jnp.where(nv_t[:, None], jnp.exp(neg - mx), 0.0)
    s = ex / jnp.maximum(jnp.sum(ex, axis=2, keepdims=True), 1e-16)
    pooled = jnp.sum(s * lf, axis=2)                       # (B, C, N)
    return jnp.swapaxes(pooled, 1, 2), mu, var, n_valid


@pytest.mark.parametrize("n_valid", [None, [900, 500]])
def test_lfa_train_forward_and_moments(n_valid):
    x, pos, mask = _batch(n_valid=n_valid)
    idx, nv = _graph(pos, mask)
    w_e, b_e, gamma, beta, att_t = _params()

    pooled, mu, var, n = plt_mod.lfa_train_pallas(
        x, pos, mask, idx, nv, w_e, b_e, gamma, beta, att_t,
        window=WINDOW, interpret=True,
    )
    ref_pooled, ref_mu, ref_var, ref_n = _reference(
        x, pos, mask, idx, nv, w_e, b_e, gamma, beta, att_t
    )
    assert float(n) == pytest.approx(float(ref_n))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(ref_mu),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                               rtol=1e-3, atol=1e-3)
    a = np.asarray(pooled)[np.asarray(mask)]
    b = np.asarray(ref_pooled)[np.asarray(mask)]
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_lfa_train_grads_match_autodiff():
    x, pos, mask = _batch()
    idx, nv = _graph(pos, mask)
    w_e, b_e, gamma, beta, att_t = _params()
    w = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, N, C)).astype(np.float32)
    ) * mask[..., None]

    def loss_kernel(x, w_e, b_e, gamma, beta, att_t):
        pooled, _, _, _ = plt_mod.lfa_train_pallas(
            x, pos, mask, idx, nv, w_e, b_e, gamma, beta, att_t,
            window=WINDOW, interpret=True,
        )
        return jnp.sum((pooled * w) ** 2)

    def loss_ref(x, w_e, b_e, gamma, beta, att_t):
        pooled, _, _, _ = _reference(
            x, pos, mask, idx, nv, w_e, b_e, gamma, beta, att_t
        )
        return jnp.sum((pooled * w) ** 2)

    args = (x, w_e, b_e, gamma, beta, att_t)
    gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ["x", "w_e", "b_e", "gamma", "beta", "att_t"]
    # global scale: b_e's reference "gradient" is pure f32 cancellation
    # noise (~5e-5; finite differences confirm the analytic zero the
    # kernel returns), so a per-tensor scale would amplify noise
    global_scale = max(
        float(np.abs(np.asarray(g)).max()) for g in gr
    )
    for name, a, b in zip(names, gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a / global_scale, b / global_scale, rtol=0, atol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_lfa_module_fused_train_matches_standard(monkeypatch):
    """Full flax-module path: LocalFeatureAggregation(train=True) through
    the fused_train_window branch vs the standard branch on the SAME
    variables — outputs, BN running-stat updates, and parameter/input
    gradients must agree."""
    monkeypatch.setattr(plt_mod, "FORCE_INTERPRET", True)
    from myria3d_tpu.models.modules.randla_net import (
        LocalFeatureAggregation,
    )

    x, pos, mask = _batch()
    idx, nv = _graph(pos, mask)

    idx_t = jnp.swapaxes(idx, 1, 2)
    nv_t = jnp.swapaxes(nv, 1, 2)
    pos_cf = jnp.swapaxes(pos, 1, 2)
    pos_j = jax.vmap(lambda t, i: t[:, i])(pos_cf, idx_t)
    pos_i = pos_cf[:, :, None, :]
    diff = pos_j - pos_i
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(diff * diff, axis=1, keepdims=True), 0.0))
    rel = jnp.concatenate(
        [jnp.broadcast_to(pos_i, pos_j.shape), pos_j, diff, dist], axis=1
    )

    lfa = LocalFeatureAggregation(C)
    vs = lfa.init(
        {"params": jax.random.PRNGKey(0)}, x, rel, idx_t, nv_t, mask, False
    )
    # perturb EVERY param (flax inits biases to zero — a probe-extraction
    # bug that cancels at zero bias must not slip through)
    import flax

    rng = np.random.default_rng(11)
    vs = flax.core.unfreeze(vs)
    vs["params"] = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(
            rng.normal(0, 0.2, np.shape(p)).astype(np.float32)
        ),
        vs["params"],
    )

    def run_std(v, xx):
        return lfa.apply(v, xx, rel, idx_t, nv_t, mask, True,
                         mutable=["batch_stats"])

    def run_fused(v, xx):
        return lfa.apply(
            v, xx, None, None, None, mask, True,
            mutable=["batch_stats"],
            pos=pos, idx=idx, neigh_valid=nv, fused_train_window=WINDOW,
        )

    out_std, upd_std = run_std(vs, x)
    out_fused, upd_fused = run_fused(vs, x)
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out_std)[m], np.asarray(out_fused)[m],
        rtol=3e-3, atol=3e-3,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(upd_std),
        jax.tree_util.tree_leaves(upd_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )

    def loss(run):
        def f(v, xx):
            out, _ = run(v, xx)
            return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)
        return f

    g_std = jax.grad(loss(run_std), argnums=(0, 1))(vs, x)
    g_fused = jax.grad(loss(run_fused), argnums=(0, 1))(vs, x)
    leaves_s = jax.tree_util.tree_leaves(g_std)
    leaves_f = jax.tree_util.tree_leaves(g_fused)
    global_scale = max(
        float(np.abs(np.asarray(g)).max()) for g in leaves_s
    )
    for a, b in zip(leaves_f, leaves_s):
        np.testing.assert_allclose(
            np.asarray(a) / global_scale, np.asarray(b) / global_scale,
            rtol=0, atol=3e-3,
        )
