"""Numeric oracles for the fused Pallas binned-top-k kNN kernel
(``ops/pallas_knn.py``), run in interpreter mode on CPU.

With ``bins >= padded Nk`` every key owns a bin and the kernel is exact —
tested bit-level against the brute-force oracle. With fewer bins it matches
``approx_min_k`` semantics — tested as recall >= 0.9 on uniform clouds.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from myria3d_tpu.ops.knn import _augment_keys, _augment_queries
from myria3d_tpu.ops.pallas_knn import knn_topk_pallas


def _np_knn(qpos, kpos, kvalid, k):
    d2 = ((qpos[:, None, :] - kpos[None, :, :]) ** 2).sum(-1)
    d2[:, ~kvalid] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def _run(pos_q, pos_k, kvalid, k, bins, tile_q=8, variant="vpu"):
    q4 = _augment_queries(jnp.asarray(pos_q))
    k4 = _augment_keys(jnp.asarray(pos_k), jnp.asarray(kvalid))
    idx, d2 = knn_topk_pallas(
        q4, k4, k, tile_q=tile_q, bins=bins, interpret=True, variant=variant
    )
    return np.asarray(idx), np.asarray(d2)


@pytest.mark.parametrize("variant", ["vpu", "mxu"])
def test_exact_when_bins_cover_keys(variant):
    rng = np.random.default_rng(0)
    B, Nq, Nk, K = 2, 16, 128, 8
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    valid[1, 100:] = False
    idx, d2 = _run(q, kp, valid, K, bins=128, variant=variant)
    for b in range(B):
        ref_idx, ref_d2 = _np_knn(q[b], kp[b], valid[b], K)
        np.testing.assert_allclose(d2[b], ref_d2, atol=1e-5)
        for i in range(Nq):
            assert set(idx[b, i]) == set(ref_idx[i]), (b, i)


def test_nn1_delegation_exact_at_georeferenced_scale():
    """k=1 via the shared binned kernel is EXACT (the global min survives
    per-bin minima for any binning); checked against a float64 brute-force
    oracle at Lambert-93 coordinate magnitudes (the regression scale of the
    round-1 f32-cancellation bug)."""
    from myria3d_tpu.ops.pallas_nn1 import nearest_neighbor_pallas

    rng = np.random.default_rng(7)
    B, Nq, Nk = 2, 64, 640  # Nk pads to bins inside the kernel
    base = np.array([650_000.0, 6_600_000.0, 120.0], np.float64)
    kp = (base + rng.uniform(0, 50, (B, Nk, 3))).astype(np.float32)
    q = (base + rng.uniform(0, 50, (B, Nq, 3))).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    valid[0, 600:] = False
    idx, d2 = nearest_neighbor_pallas(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(valid), interpret=True
    )
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for b in range(B):
        ref = ((q[b].astype(np.float64)[:, None]
                - kp[b].astype(np.float64)[None]) ** 2).sum(-1)
        ref[:, ~valid[b]] = np.inf
        np.testing.assert_array_equal(idx[b], ref.argmin(1))
        np.testing.assert_allclose(d2[b], ref.min(1), rtol=1e-3, atol=1e-2)


def test_distances_ascending_and_recall_binned():
    rng = np.random.default_rng(1)
    B, Nq, Nk, K = 1, 8, 512, 8
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    idx, d2 = _run(q, kp, valid, K, bins=128)  # 4 chunks -> collisions
    assert (np.diff(d2[0], axis=1) >= -1e-6).all()
    ref_idx, _ = _np_knn(q[0], kp[0], valid[0], K)
    recall = np.mean([
        len(set(idx[0, i]) & set(ref_idx[i])) / K for i in range(Nq)
    ])
    assert recall >= 0.9, recall


def test_pads_never_selected():
    rng = np.random.default_rng(2)
    B, Nq, Nk, K = 1, 8, 200, 4  # Nk pads up to 256
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    valid[0, 150:] = False
    kp[0, 150:] = q[0, 0]  # masked keys sitting ON a query
    idx, d2 = _run(q, kp, valid, K, bins=128)
    assert (d2 < 1e7).all()          # no pad (>=1e8) leaked into top-k
    assert (idx < 150).all()


def test_query_padding_sliced_off():
    rng = np.random.default_rng(3)
    B, Nq, Nk, K = 1, 5, 128, 3     # Nq=5 pads to tile_q=8
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    idx, d2 = _run(q, kp, valid, K, bins=128)
    assert idx.shape == (B, Nq, K) and d2.shape == (B, Nq, K)
    ref_idx, ref_d2 = _np_knn(q[0], kp[0], valid[0], K)
    np.testing.assert_allclose(d2[0], ref_d2, atol=1e-5)


def _np_interp(x, kpos, kvalid, qpos, k):
    """pyg knn_interpolate oracle: w = 1/max(d2, 1e-16), y = Σwx/Σw."""
    out = np.zeros((qpos.shape[0], x.shape[-1]), np.float32)
    idx, d2 = _np_knn(qpos, kpos, kvalid, k)
    for i in range(qpos.shape[0]):
        valid = np.isfinite(d2[i])
        w = np.where(valid, 1.0 / np.maximum(d2[i], 1e-16), 0.0)
        den = w.sum()
        if den > 0:
            out[i] = (w[:, None] * x[idx[i]]).sum(0) / den
    return out


def test_fused_interp_exact_when_bins_cover_keys():
    """bins >= padded Nk makes *selection* exact -> the fused kernel must
    reproduce the brute-force pyg weighting up to the bf16 recombine
    precision (the MXU matmul phase carries weights/payload at bf16,
    ~2^-8 relative — within the interp step's f16 wire contract),
    including a cloud with pad keys and C not a sublane multiple."""
    from myria3d_tpu.ops.pallas_knn import knn_interpolate_pallas

    rng = np.random.default_rng(11)
    B, Nq, Nk, K, C = 2, 24, 200, 10, 7   # Nk pads to 256, C pads to 16
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    x = rng.normal(size=(B, Nk, C)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    valid[1, 150:] = False
    out = np.asarray(knn_interpolate_pallas(
        jnp.asarray(x), jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(q),
        k=K, tile_q=8, bins=256, interpret=True,
    ))
    assert out.shape == (B, Nq, C)
    for b in range(B):
        ref = _np_interp(x[b], kp[b], valid[b], q[b], K)
        np.testing.assert_allclose(out[b], ref, rtol=2e-2, atol=1e-2)


def test_fused_interp_matches_index_kernel_when_binned():
    """With bin collisions the fused kernel must weight exactly the bins the
    index kernel selects — cross-checked by gathering/weighting the index
    kernel's output by hand."""
    from myria3d_tpu.ops.pallas_knn import knn_interpolate_pallas

    rng = np.random.default_rng(12)
    B, Nq, Nk, K, C = 1, 16, 512, 8, 4
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    x = rng.normal(size=(B, Nk, C)).astype(np.float32)
    valid = np.ones((B, Nk), bool)
    out = np.asarray(knn_interpolate_pallas(
        jnp.asarray(x), jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(q),
        k=K, tile_q=8, bins=128, interpret=True,
    ))
    idx, d2 = _run(q, kp, valid, K, bins=128)
    for b in range(B):
        w = 1.0 / np.maximum(d2[b], 1e-16)
        w[d2[b] >= 0.25e8] = 0.0
        den = np.maximum(w.sum(1, keepdims=True), 1e-16)
        ref = (w[..., None] * x[b][idx[b]]).sum(1) / den
        np.testing.assert_allclose(out[b], ref, rtol=2e-2, atol=1e-2)


def test_fused_interp_empty_keys_returns_zero():
    from myria3d_tpu.ops.pallas_knn import knn_interpolate_pallas

    rng = np.random.default_rng(13)
    B, Nq, Nk, K, C = 1, 8, 128, 5, 3
    q = rng.uniform(-1, 1, (B, Nq, 3)).astype(np.float32)
    kp = rng.uniform(-1, 1, (B, Nk, 3)).astype(np.float32)
    x = rng.normal(size=(B, Nk, C)).astype(np.float32)
    valid = np.zeros((B, Nk), bool)   # whole cloud is pads
    out = np.asarray(knn_interpolate_pallas(
        jnp.asarray(x), jnp.asarray(kp), jnp.asarray(valid), jnp.asarray(q),
        k=K, tile_q=8, bins=128, interpret=True,
    ))
    np.testing.assert_array_equal(out, 0.0)


def test_grad_flows_past_kernel():
    """The kernel is declared non-differentiable (zero-tangent custom_jvp):
    jax.grad of a loss that consumes its outputs must work — regression for
    the TPU train step, where pallas_call has no AD rule and linearization
    failed without the wrapper."""
    import jax

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, (1, 8, 3)).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32))
    w = jnp.ones((3,), jnp.float32)

    def loss(w):
        q4 = _augment_queries(q * w)          # params touch the query path
        k4 = _augment_keys(kp, jnp.ones((1, 128), bool))
        idx, d2 = knn_topk_pallas(q4, k4, 4, tile_q=8, bins=128,
                                  interpret=True)
        # downstream gather carries the gradient; indices must not
        feats = jnp.take_along_axis(
            (kp * w).sum(-1, keepdims=True), idx[..., 0:1], axis=1
        )
        return jnp.sum(feats)

    g = jax.grad(loss)(w)
    assert g.shape == (3,)
    assert np.isfinite(np.asarray(g)).all()
