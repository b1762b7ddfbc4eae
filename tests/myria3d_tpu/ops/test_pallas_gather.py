"""Windowed one-hot gather + scatter-add VJP (interpret mode).

Checks the train-path gather kernel (``ops/pallas_gather.py``) against the
stock XLA formulation: forward values (zeros at invalid slots), the
custom-VJP gradient vs autodiff of the reference, and the module-level
``LocalFeatureAggregation`` integration — values AND parameter/input
gradients must match the standard gather branch exactly (f32 interpret).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myria3d_tpu.ops.pallas_gather as pallas_gather
from myria3d_tpu.models.modules.randla_net import LocalFeatureAggregation
from myria3d_tpu.ops.knn import _augment_keys, _augment_queries
from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

B, N, K, C = 2, 2048, 8, 16
WINDOW, BINS, TILE_Q = 1024, 512, 256


def _sorted_batch(seed=0, n_valid=None):
    rng = np.random.default_rng(seed)
    pos = np.stack([
        rng.uniform(0, 50, (B, N)),
        rng.uniform(0, 50, (B, N)),
        rng.uniform(0, 3, (B, N)),
    ], axis=-1).astype(np.float32)
    pos = np.take_along_axis(pos, np.argsort(pos[..., 0:1], axis=1), axis=1)
    mask = np.ones((B, N), bool)
    if n_valid is not None:
        for b, nv in enumerate(n_valid):
            mask[b, nv:] = False
            pos[b, nv:] = pos[b, 0]
    x = rng.uniform(-1, 1, (B, N, C // 2)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def _windowed_graph(pos, mask):
    """Graph whose every valid index is in-window by construction."""
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
    idx = jnp.where(nv, idx, 0)
    return idx, nv


def _reference_gather(payload_cf, idx, nv):
    """XLA gather with the kernel's invalid-slot-zero semantics."""
    idx_t = jnp.swapaxes(idx, 1, 2)                           # (B, K, N)
    g = jax.vmap(lambda t, i: t[:, i])(payload_cf, idx_t)     # (B, P, K, N)
    return jnp.where(jnp.swapaxes(nv, 1, 2)[:, None], g, 0.0)


@pytest.mark.parametrize("n_valid", [None, [1700, 900]])
def test_windowed_gather_matches_reference(n_valid):
    x, pos, mask = _sorted_batch(n_valid=n_valid)
    idx, nv = _windowed_graph(pos, mask)
    payload = jnp.swapaxes(
        jnp.concatenate([pos, x], axis=-1), 1, 2
    )                                                          # (B, 3+C/2, N)

    out = pallas_gather.gather_neighbors_windowed(
        payload, idx, nv, WINDOW, interpret=True
    )
    ref = _reference_gather(payload, idx, nv)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("grad_precision,rtol,atol", [
    # exact: agreement up to f32 summation order only
    ("exact", 1e-4, 1e-5),
    # hilo: dout rides the MXU as a bf16 hi/lo split (~2^-16 relative)
    ("hilo", 1e-3, 1e-4),
])
def test_windowed_gather_grad_matches_autodiff(grad_precision, rtol, atol):
    x, pos, mask = _sorted_batch()
    idx, nv = _windowed_graph(pos, mask)
    payload = jnp.swapaxes(jnp.concatenate([pos, x], axis=-1), 1, 2)
    w = jnp.asarray(
        np.random.default_rng(3).normal(size=(B, payload.shape[1], K, N))
    ).astype(jnp.float32)

    def loss_kernel(p):
        out = pallas_gather.gather_neighbors_windowed(
            p, idx, nv, WINDOW, interpret=True,
            grad_precision=grad_precision,
        )
        return jnp.sum(out * w)

    def loss_ref(p):
        return jnp.sum(_reference_gather(p, idx, nv) * w)

    g_kernel = jax.grad(loss_kernel)(payload)
    g_ref = jax.grad(loss_ref)(payload)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=rtol, atol=atol
    )


@pytest.mark.parametrize("train", [False, True])
def test_lfa_with_windowed_gather_matches_standard(train, monkeypatch):
    monkeypatch.setattr(pallas_gather, "FORCE_INTERPRET", True)
    x, pos, mask = _sorted_batch()
    idx, nv = _windowed_graph(pos, mask)

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

    def run(v, xx, gather_window):
        kw = dict(idx=idx, neigh_valid=nv, gather_window=gather_window)
        if train:
            out, upd = lfa.apply(
                v, xx, rel, idx_t, nv_t, mask, True,
                mutable=["batch_stats"], **kw,
            )
            return out, upd
        return lfa.apply(v, xx, rel, idx_t, nv_t, mask, False, **kw), None

    out_std, upd_std = run(vs, x, 0)
    out_win, upd_win = run(vs, x, WINDOW)
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out_std)[m], np.asarray(out_win)[m], rtol=2e-5, atol=2e-5
    )
    if train:
        # BN batch moments must agree (masked slots excluded identically)
        js, jw = (
            jax.tree_util.tree_leaves(upd_std),
            jax.tree_util.tree_leaves(upd_win),
        )
        for a, b in zip(js, jw):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            )

    # gradients w.r.t. params and input features agree between branches
    def loss(v, xx, gather_window):
        out, _ = run(v, xx, gather_window)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    g_std = jax.grad(loss, argnums=(0, 1))(vs, x, 0)
    g_win = jax.grad(loss, argnums=(0, 1))(vs, x, WINDOW)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_std), jax.tree_util.tree_leaves(g_win)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
