"""Fused windowed LFA kernel (interpret mode) vs the standard module path.

Runs ``LocalFeatureAggregation`` twice on the SAME parameter/stat
variables — once through the stock gather + masked-softmax branch, once
through the fused Pallas branch (``ops/pallas_lfa.py``) — and asserts the
attention-pooled features agree to the kernel's bf16-payload contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import myria3d_tpu.ops.pallas_lfa as pallas_lfa
from myria3d_tpu.models.modules.randla_net import LocalFeatureAggregation
from myria3d_tpu.ops.pallas_knn import knn_topk_pallas
from myria3d_tpu.ops.knn import _augment_keys, _augment_queries

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
            pos[b, nv:] = pos[b, 0]   # decimated-stage pad artifact
    x = rng.uniform(-1, 1, (B, N, C // 2)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def _windowed_graph(pos, mask):
    """Neighbor graph whose every valid index is in-window by
    construction (the contract the fused gather relies on)."""
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


def _standard_inputs(x, pos, idx, nv):
    """The exact channels-first tensors DilatedResidualBlock builds."""
    idx_t = jnp.swapaxes(idx, 1, 2)                       # (B, K, N)
    nv_t = jnp.swapaxes(nv, 1, 2)
    pos_cf = jnp.swapaxes(pos, 1, 2)                      # (B, 3, N)
    pos_j = jax.vmap(lambda t, i: t[:, i])(pos_cf, idx_t)
    pos_i = pos_cf[:, :, None, :]
    diff = pos_j - pos_i
    dist = jnp.sqrt(jnp.maximum(
        jnp.sum(diff * diff, axis=1, keepdims=True), 0.0))
    rel = jnp.concatenate(
        [jnp.broadcast_to(pos_i, pos_j.shape), pos_j, diff, dist], axis=1
    )                                                      # (B, 10, K, N)
    return rel, idx_t, nv_t


@pytest.mark.parametrize("n_valid", [None, [1700, 900]])
def test_fused_lfa_matches_standard_path(n_valid, monkeypatch):
    monkeypatch.setattr(pallas_lfa, "FORCE_INTERPRET", True)
    x, pos, mask = _sorted_batch(n_valid=n_valid)
    idx, nv = _windowed_graph(pos, mask)
    rel, idx_t, nv_t = _standard_inputs(x, pos, idx, nv)

    lfa = LocalFeatureAggregation(C)
    vs = jax.jit(
        lambda r, *a: lfa.init(r, *a, False)
    )({"params": jax.random.PRNGKey(0)}, x, rel, idx_t, nv_t, mask)
    # make BN folding non-trivial: perturbed running stats
    import flax

    stats = flax.core.unfreeze(vs).get("batch_stats", {})
    rng = np.random.default_rng(9)

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                noise = rng.uniform(0.5, 1.5, np.shape(v)).astype(np.float32)
                out[k] = (
                    jnp.asarray(noise) if k == "var"
                    else jnp.asarray(noise - 1.0)
                )
        return out

    vs = dict(vs)
    if stats:
        vs["batch_stats"] = walk(stats)

    out_std = jax.jit(
        lambda v, *a: lfa.apply(v, *a, False)
    )(vs, x, rel, idx_t, nv_t, mask)
    out_fused = jax.jit(
        lambda v, xx, pp, mm, ii, nn: lfa.apply(
            v, xx, None, None, None, mm, False,
            pos=pp, idx=ii, neigh_valid=nn, fused_window=WINDOW,
        )
    )(vs, x, pos, mask, idx, nv)

    a = np.asarray(out_std)[np.asarray(mask)]
    b = np.asarray(out_fused)[np.asarray(mask)]
    denom = np.abs(a) + 1e-2
    rel_err = np.abs(a - b) / denom
    assert np.median(rel_err) < 0.02, np.median(rel_err)
    assert (rel_err < 0.2).mean() > 0.99, (rel_err < 0.2).mean()
    # pad rows: both paths meaningless there, but fused must stay finite
    assert np.isfinite(np.asarray(out_fused)).all()
