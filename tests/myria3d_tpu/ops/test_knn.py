"""Numeric parity tests of the masked kNN / interpolation / decimation kernels
against brute-force numpy oracles (SURVEY.md §4: what the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from myria3d_tpu.ops import knn, knn_graph, knn_interpolate, random_decimation
from myria3d_tpu.ops.knn import gather_neighbors
from myria3d_tpu.ops.masked import masked_mean, masked_softmax, masked_var


def _np_knn(qpos, kpos, kvalid, k):
    d2 = ((qpos[:, None, :] - kpos[None, :, :]) ** 2).sum(-1)
    d2[:, ~kvalid] = np.inf
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, N, K = 3, 256, 16
    pos = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), dtype=bool)
    mask[1, 200:] = False  # one partially padded cloud
    idx, d2, nv = knn_graph(jnp.asarray(pos), jnp.asarray(mask), K)
    idx, d2, nv = np.asarray(idx), np.asarray(d2), np.asarray(nv)
    for b in range(B):
        ref_idx, ref_d2 = _np_knn(pos[b], pos[b], mask[b], K)
        # distances must match exactly (sorted ascending)
        np.testing.assert_allclose(np.sort(d2[b], axis=1), np.sort(ref_d2, axis=1),
                                   atol=1e-4)
        # neighbor sets must match (indices may permute among equal distances)
        for i in range(0, N, 37):
            if not mask[b, i]:
                continue
            assert set(idx[b, i]) == set(ref_idx[i]), (b, i)


def test_knn_at_georeferenced_scale():
    """Regression: absolute Lambert-93 coordinates (|Y| ~ 6.6e6 m) must not
    scramble neighbor ranking through f32 cancellation in the norm expansion
    (ADVICE r1). Oracle is float64 brute force."""
    rng = np.random.default_rng(42)
    B, N, K = 2, 512, 10
    # a 50 m subtile somewhere in France
    origin = np.array([652000.0, 6862000.0, 120.0])
    pos64 = origin + rng.uniform(0, 50, (B, N, 3)) * np.array([1.0, 1.0, 0.4])
    pos = pos64.astype(np.float32)
    # oracle in float64 on the f32-quantized inputs: tests the algorithm's
    # cancellation, not the (inherent, ~0.25 m) input rounding
    pos64 = pos.astype(np.float64)
    mask = np.ones((B, N), dtype=bool)
    mask[1, 480:] = False
    idx, d2, nv = knn(jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(mask),
                      K, query_mask=jnp.asarray(mask), exact=True)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    match = 0
    checked = 0
    for b in range(B):
        ref_idx, ref_d2 = _np_knn(pos64[b], pos64[b], mask[b], K)
        for i in range(0, N, 17):
            if not mask[b, i]:
                continue
            checked += 1
            match += len(set(idx[b, i]) & set(ref_idx[i])) / K
        # distances small and accurate (not ~1e6 m^2 rounding noise)
        np.testing.assert_allclose(
            np.sort(d2[b][mask[b]], axis=-1),
            np.sort(ref_d2[mask[b]], axis=-1), rtol=1e-3, atol=1e-2,
        )
    assert match / checked > 0.99, f"true-NN recall {match / checked:.3f}"


def test_knn_interpolate_at_georeferenced_scale():
    """k=1 interpolation at absolute coordinate scale copies the true
    nearest source feature (covers the dense path used on CPU/mesh)."""
    rng = np.random.default_rng(43)
    origin = np.array([652000.0, 6862000.0, 120.0], dtype=np.float64)
    src64 = origin + rng.uniform(0, 50, (1, 256, 3))
    tgt64 = src64 + rng.normal(0, 1e-3, src64.shape)
    x = rng.normal(size=(1, 256, 4)).astype(np.float32)
    mask = np.ones((1, 256), dtype=bool)
    out = np.asarray(knn_interpolate(
        jnp.asarray(x), jnp.asarray(src64.astype(np.float32)), jnp.asarray(mask),
        jnp.asarray(tgt64.astype(np.float32)), jnp.asarray(mask), k=1))
    np.testing.assert_allclose(out[0], x[0], atol=1e-3)


def test_knn_self_loop_first():
    rng = np.random.default_rng(1)
    pos = rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32)
    mask = np.ones((1, 128), dtype=bool)
    idx, d2, nv = knn_graph(jnp.asarray(pos), jnp.asarray(mask), 8)
    # self is its own nearest neighbor (loop=True semantics)
    np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(128))
    assert np.allclose(np.asarray(d2)[0, :, 0], 0.0, atol=1e-5)


def test_knn_fewer_valid_than_k():
    pos = np.zeros((1, 128, 3), dtype=np.float32)
    pos[0, :5] = np.random.default_rng(2).uniform(0, 1, (5, 3))
    mask = np.zeros((1, 128), dtype=bool)
    mask[0, :5] = True
    idx, d2, nv = knn_graph(jnp.asarray(pos), jnp.asarray(mask), 16)
    nv = np.asarray(nv)
    # only 5 valid neighbors possible
    assert nv[0, 0].sum() == 5
    assert not nv[0, 10].any()  # invalid query → all invalid
    # pad-slot indices are clamped to 0 (safe gather)
    assert (np.asarray(idx)[0, 0, 5:] == 0).all()


def test_knn_pads_never_neighbors():
    rng = np.random.default_rng(3)
    pos = rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32)
    # put pads exactly at a valid point's location — must still be excluded
    pos[0, 128:] = pos[0, 0]
    mask = np.ones((2, 256), dtype=bool)
    mask[0, 128:] = False
    idx, d2, nv = knn_graph(jnp.asarray(pos), jnp.asarray(mask), 4)
    sel = np.asarray(idx)[0][np.asarray(nv)[0]]
    assert (sel < 128).all()


def test_knn_interpolate_k1_copies_nearest():
    rng = np.random.default_rng(4)
    src = rng.uniform(-1, 1, (1, 128, 3)).astype(np.float32)
    x = rng.normal(size=(1, 128, 7)).astype(np.float32)
    mask = np.ones((1, 128), dtype=bool)
    tgt = src + 1e-4  # targets next to sources
    out = knn_interpolate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(mask),
                          jnp.asarray(tgt), jnp.asarray(mask), k=1)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-4)


def test_knn_interpolate_matches_pyg_semantics():
    """Oracle: w = 1/max(d2,1e-16); y = Σwx/Σw over k=3 nearest."""
    rng = np.random.default_rng(5)
    B, Ns, Nt, C, K = 1, 128, 64, 5, 3
    src = rng.uniform(-1, 1, (B, Ns, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (B, Nt, 3)).astype(np.float32)
    x = rng.normal(size=(B, Ns, C)).astype(np.float32)
    mask_s = np.ones((B, Ns), dtype=bool)
    mask_t = np.ones((B, Nt), dtype=bool)
    out = np.asarray(
        knn_interpolate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(mask_s),
                        jnp.asarray(tgt), jnp.asarray(mask_t), k=K)
    )
    idx, d2 = _np_knn(tgt[0], src[0], mask_s[0], K)
    w = 1.0 / np.maximum(d2, 1e-16)
    ref = (x[0][idx] * w[..., None]).sum(1) / w.sum(1, keepdims=True)
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-5)


def test_random_decimation_counts_and_uniformity():
    key = jax.random.PRNGKey(0)
    mask = np.ones((3, 512), dtype=bool)
    mask[1, 100:] = False   # 100 valid
    mask[2, 2:] = False     # 2 valid < decimation → keep 1
    idx, new_mask = random_decimation(key, jnp.asarray(mask), 4)
    idx, new_mask = np.asarray(idx), np.asarray(new_mask)
    assert idx.shape == (3, 128)
    assert new_mask[0].sum() == 512 // 4
    assert new_mask[1].sum() == 100 // 4
    assert new_mask[2].sum() == 1  # never empties a cloud
    # kept indices are valid points, and unique
    for b in range(3):
        kept = idx[b][new_mask[b]]
        assert len(set(kept.tolist())) == len(kept)
        assert mask[b][kept].all()


def test_random_decimation_is_random():
    mask = jnp.ones((1, 512), dtype=bool)
    idx1, _ = random_decimation(jax.random.PRNGKey(1), mask, 4)
    idx2, _ = random_decimation(jax.random.PRNGKey(2), mask, 4)
    assert not np.array_equal(np.asarray(idx1), np.asarray(idx2))


def test_random_decimation_empty_cloud():
    mask = jnp.zeros((1, 512), dtype=bool)
    idx, new_mask = random_decimation(jax.random.PRNGKey(0), mask, 4)
    assert not np.asarray(new_mask).any()


def test_masked_softmax_excludes_invalid():
    scores = jnp.asarray(np.random.default_rng(6).normal(size=(2, 4, 8, 3)))
    valid = np.ones((2, 4, 8, 1), dtype=bool)
    valid[0, 0, 4:] = False
    out = np.asarray(masked_softmax(scores, jnp.asarray(valid), axis=2))
    np.testing.assert_allclose(out.sum(axis=2), 1.0, atol=1e-5)
    assert (out[0, 0, 4:] == 0).all()
    # all-invalid → zeros, not NaN
    valid[0, 1, :] = False
    out = np.asarray(masked_softmax(scores, jnp.asarray(valid), axis=2))
    assert (out[0, 1] == 0).all()
    assert not np.isnan(out).any()


def test_masked_moments():
    rng = np.random.default_rng(7)
    x = rng.normal(2.0, 3.0, (4, 100, 8)).astype(np.float32)
    mask = rng.random((4, 100)) < 0.7
    mean = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask[..., None]), axis=(0, 1)))
    var = np.asarray(masked_var(jnp.asarray(x), jnp.asarray(mask[..., None]), axis=(0, 1)))
    ref_mean = x[mask].mean(axis=0)
    ref_var = x[mask].var(axis=0)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-4)
    np.testing.assert_allclose(var, ref_var, rtol=1e-3)


def test_gather_neighbors():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    idx = jnp.asarray([[[0, 2], [5, 5]]])
    out = np.asarray(gather_neighbors(x, idx))
    assert out.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(out[0, 0, 1], np.arange(8, 12))


def test_random_decimation_preserves_sorted_order():
    """Order-preserving decimation: kept indices ascend, so an x-sorted
    cloud stays x-sorted through every stage (windowed kNN contract)."""
    mask = np.ones((2, 512), dtype=bool)
    mask[1, 300:] = False
    idx, new_mask = random_decimation(jax.random.PRNGKey(3), jnp.asarray(mask), 4)
    idx, new_mask = np.asarray(idx), np.asarray(new_mask)
    for b in range(2):
        kept = idx[b][new_mask[b]]
        assert (np.diff(kept) > 0).all()
