"""x-sorted windowed kNN: the SortPointsByX transform's permutation
contract and the windowed Pallas kernels (interpret mode) against the
dense exact reference. Device timings live in docs/perf_notes.md round 4."""

import numpy as np
import pytest

from myria3d_tpu.pctl.transforms.transforms import SortPointsByX

# ---------------------------------------------------------------------------
# transform
# ---------------------------------------------------------------------------


def _sample(n=64, m=200, seed=0):
    rng = np.random.default_rng(seed)
    pos_full = rng.uniform(0, 50, (m, 3)).astype(np.float32)
    data = {
        "pos": rng.uniform(0, 50, (n, 3)).astype(np.float32),
        "x": rng.uniform(0, 1, (n, 5)).astype(np.float32),
        "y": rng.integers(0, 7, n).astype(np.int32),
        "idx_in_original_cloud": np.arange(100, 100 + m, dtype=np.int64),
        "copies": {
            "pos_copy": pos_full,
            "transformed_y_copy": rng.integers(0, 7, m).astype(np.int32),
            "pos_sampled_copy": rng.uniform(0, 50, (n, 3)).astype(np.float32),
        },
    }
    return data


def test_sort_transform_consistent_permutation():
    data = _sample()
    orig = {
        "pos": data["pos"].copy(), "x": data["x"].copy(),
        "y": data["y"].copy(),
        "pos_copy": data["copies"]["pos_copy"].copy(),
        "ty": data["copies"]["transformed_y_copy"].copy(),
        "psc": data["copies"]["pos_sampled_copy"].copy(),
        "idx": data["idx_in_original_cloud"].copy(),
    }
    out = SortPointsByX()(data)

    # sampled arrays sorted by x, one shared permutation
    assert (np.diff(out["pos"][:, 0]) >= 0).all()
    perm_s = np.argsort(orig["pos"][:, 0], kind="stable")
    np.testing.assert_array_equal(out["pos"], orig["pos"][perm_s])
    np.testing.assert_array_equal(out["x"], orig["x"][perm_s])
    np.testing.assert_array_equal(out["y"], orig["y"][perm_s])
    np.testing.assert_array_equal(
        out["copies"]["pos_sampled_copy"], orig["psc"][perm_s]
    )

    # full-cloud stash sorted by pos_copy x, aligned with idx + targets
    perm_f = np.argsort(orig["pos_copy"][:, 0], kind="stable")
    np.testing.assert_array_equal(
        out["copies"]["pos_copy"], orig["pos_copy"][perm_f]
    )
    np.testing.assert_array_equal(
        out["copies"]["transformed_y_copy"], orig["ty"][perm_f]
    )
    np.testing.assert_array_equal(
        out["idx_in_original_cloud"], orig["idx"][perm_f]
    )


def test_sort_transform_without_copies():
    data = {
        "pos": np.array([[3.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32),
        "y": np.array([30, 10, 20], np.int32),
    }
    out = SortPointsByX()(data)
    np.testing.assert_array_equal(out["y"], [10, 20, 30])


# ---------------------------------------------------------------------------
# windowed kernels (interpret mode — runs on CPU)
# ---------------------------------------------------------------------------


def _sorted_cloud(b, n, seed=0, extent=50.0):
    """Surface-like cloud, x-sorted, pad-augmented like ops.knn does."""
    rng = np.random.default_rng(seed)
    pos = np.stack([
        rng.uniform(0, extent, (b, n)),
        rng.uniform(0, extent, (b, n)),
        rng.uniform(0, 2.0, (b, n)),
    ], axis=-1).astype(np.float32)
    pos = np.take_along_axis(pos, np.argsort(pos[..., 0:1], axis=1), axis=1)
    pos -= pos.mean(axis=1, keepdims=True)
    w = np.zeros((b, n, 1), np.float32)
    return np.concatenate([pos, w], axis=-1)


def _exact_ref(q4, k4, k):
    d2 = (
        (q4[:, :, None, :3] - k4[:, None, :, :3]) ** 2
    ).sum(-1) + (k4[:, None, :, 3] ** 2)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    return idx, np.take_along_axis(d2, idx, axis=-1)


@pytest.mark.parametrize("packed", [True, False])
def test_windowed_knn_matches_dense_recall(packed):
    from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

    b, n, k = 2, 2048, 8
    q4 = _sorted_cloud(b, n)
    idx_w, d2_w = knn_topk_pallas(
        q4, q4, k, interpret=True, window=1024, bins=512, tile_q=256,
        packed=packed,
    )
    idx_e, d2_e = _exact_ref(q4, q4, k)
    # recall vs the exact neighbor sets: windowed-binned must match the
    # full binned kernel's ~0.98 on this easy sorted cloud
    hits = sum(
        len(set(idx_w[i, r].tolist()) & set(idx_e[i, r].tolist()))
        for i in range(b) for r in range(n)
    )
    recall = hits / (b * n * k)
    assert recall >= 0.97, recall
    # distances of selected neighbors are true distances — exact on the
    # classic extraction; truncated DOWN by < 2^-(23-idx_bits) on the
    # packed one (window 1024 -> 3 chunks -> 11 idx bits -> 2^-12)
    flat_sel = np.take_along_axis(
        ((q4[:, :, None, :3] - q4[:, None, :, :3]) ** 2).sum(-1),
        idx_w, axis=-1,
    )
    if packed:
        assert (d2_w <= flat_sel + 1e-6).all()
        np.testing.assert_allclose(d2_w, flat_sel, rtol=2**-11, atol=1e-4)
    else:
        np.testing.assert_allclose(d2_w, flat_sel, rtol=1e-4, atol=1e-4)


def test_stage_window_density_scaling():
    """stage_window: ~n_keys/4 density cap (floor 5 chunks), the round-4
    honor clamp for small stages, 40k bucket unchanged, 0 passthrough."""
    from myria3d_tpu.ops.pallas_knn import stage_window

    assert stage_window(0, 12288) == 0
    assert stage_window(4608, 12288) == 3072       # 12288/4, chunk-aligned
    assert stage_window(4608, 16384) == 4096
    assert stage_window(4608, 40448) == 4608       # density cap > cfg
    # floor: never below 5 chunks from the density rule alone
    assert stage_window(4608, 8192) == 2560
    # honor clamp still rules tiny stages (w_chunks < n_chunks)
    assert stage_window(4608, 3072) == 2048        # (6-2)*512
    # cfg smaller than every cap passes through
    assert stage_window(1024, 40448) == 1024


def test_windowed_knn_packed_vs_classic_same_sets():
    """Packed extraction must select the same neighbor SETS as the classic
    two-reduction extraction away from 2^-11 score ties (random clouds:
    ties measure ~0 on continuous coordinates)."""
    from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

    b, n, k = 2, 2048, 8
    q4 = _sorted_cloud(b, n, seed=11)
    idx_p, _ = knn_topk_pallas(
        q4, q4, k, interpret=True, window=1024, bins=512, tile_q=256,
        packed=True,
    )
    idx_c, _ = knn_topk_pallas(
        q4, q4, k, interpret=True, window=1024, bins=512, tile_q=256,
        packed=False,
    )
    agree = np.mean([
        set(idx_p[i, r].tolist()) == set(idx_c[i, r].tolist())
        for i in range(b) for r in range(n)
    ])
    assert agree >= 0.999, agree


def test_windowed_knn_handles_pad_keys():
    from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

    b, n, k = 1, 1536, 4
    q4 = _sorted_cloud(b, n)
    n_valid = 1100
    q4[:, n_valid:, 3] = 1e4  # pad tail (sorted prefix stays valid)
    idx_w, d2_w = knn_topk_pallas(
        q4, q4, k, interpret=True, window=1024, bins=512, tile_q=256
    )
    # valid queries never select pad keys
    assert (idx_w[:, :n_valid] < n_valid).all()
    assert (d2_w[:, :n_valid] < 0.25e8).all()


def test_windowed_interp_matches_two_op():
    import jax.numpy as jnp

    from myria3d_tpu.ops.interpolate import knn_interpolate
    from myria3d_tpu.ops.pallas_knn import knn_interpolate_pallas

    b, nk, nq, c, k = 1, 1536, 2048, 7, 4
    rng = np.random.default_rng(3)
    k4 = _sorted_cloud(b, nk, seed=1)
    q4 = _sorted_cloud(b, nq, seed=2)
    key_pos, query_pos = k4[..., :3], q4[..., :3]
    key_mask = np.ones((b, nk), bool)
    x = rng.uniform(-1, 1, (b, nk, c)).astype(np.float32)

    out_w = np.asarray(knn_interpolate_pallas(
        jnp.asarray(x), jnp.asarray(key_pos), jnp.asarray(key_mask),
        jnp.asarray(query_pos), k=k, interpret=True, window=1024,
        bins=512, tile_q=256,
    ))
    ref = np.asarray(knn_interpolate(
        jnp.asarray(x), jnp.asarray(key_pos), jnp.asarray(key_mask),
        jnp.asarray(query_pos), None, k=k,
    ))
    # bf16 recombine + binned/windowed selection: close on an easy cloud
    err = np.abs(out_w - ref) / (np.abs(ref) + 1e-2)
    assert np.median(err) < 0.02
    assert (err < 0.5).mean() > 0.97


def test_window_bases_align_cross_density():
    """searchsorted window centers stay correct when query/key valid
    fractions differ (a proportional map would be off by thousands)."""
    import jax.numpy as jnp

    from myria3d_tpu.ops.pallas_knn import _window_bases

    b, nq_pad, nk_pad = 1, 4096, 4096
    q4 = _sorted_cloud(b, nq_pad)
    k4 = _sorted_cloud(b, nk_pad, seed=5)
    # key cloud: only the first 1536 are valid (bucket padding)
    k4[:, 1536:, 3] = 1e4
    k4[:, 1536:, 0] = 0.0  # pad x garbage must not matter
    bases = np.asarray(_window_bases(
        jnp.asarray(q4), jnp.asarray(k4), tile_q=256, w_chunks=2, bins=512
    ))
    # windows must target the VALID key prefix, never the pad tail
    assert bases.max() * 512 <= 1536


def test_windowed_nn1_decoder_density_exact():
    """The decoder k=1 upsampling shape: queries at 4x key density (the
    skip cloud searching the decimated cloud). k=1 is exact WITHIN the
    window, so nearly every query must find its true nearest key."""
    import jax.numpy as jnp

    from myria3d_tpu.ops.pallas_knn import knn_topk_pallas

    b, nq, nk = 1, 4096, 1024
    q4 = _sorted_cloud(b, nq, seed=7)
    k4 = _sorted_cloud(b, nk, seed=8)
    idx_w, d2_w = knn_topk_pallas(
        jnp.asarray(q4), jnp.asarray(k4), 1, interpret=True, window=512,
        bins=512, tile_q=256,
    )
    idx_e, d2_e = _exact_ref(q4, k4, 1)
    agree = (np.asarray(idx_w) == idx_e).mean()
    assert agree > 0.995, agree


def test_window_bases_boundary_tile_uses_query_mask():
    """Decimated stages gather slot 0 for pad rows, so a boundary tile's
    raw mid element can alias the cloud's x-MINIMUM and pull the window to
    the wrong edge; the query_mask guard clamps the probe to the last
    valid row."""
    import jax.numpy as jnp

    from myria3d_tpu.ops.pallas_knn import _window_bases

    b, nq_pad, nk_pad = 1, 2048, 2048
    q4 = _sorted_cloud(b, nq_pad)
    k4 = q4.copy()
    n_valid = 1100   # boundary tile = tile 4 (rows 1024..1280), mid at 1152
    qmask = np.zeros((b, nq_pad), bool)
    qmask[:, :n_valid] = True
    # pad rows mimic the decimated gather-slot-0 artifact: x-minimum coords
    q4[:, n_valid:, :3] = q4[:, 0:1, :3]
    k4[:, n_valid:, 3] = 1e4

    w_chunks, bins = 2, 512
    naive = np.asarray(_window_bases(
        jnp.asarray(q4), jnp.asarray(k4), 256, w_chunks, bins
    ))
    guarded = np.asarray(_window_bases(
        jnp.asarray(q4), jnp.asarray(k4), 256, w_chunks, bins,
        query_mask=jnp.asarray(qmask),
    ))
    t_boundary = n_valid // 256  # tile whose mid element is a pad row
    # naive probe reads the aliased x-min pad row -> window at the left edge
    assert naive[0, t_boundary] == 0
    # guarded probe follows the last valid x -> window covers the tail keys
    lo = guarded[0, t_boundary] * bins
    assert lo + w_chunks * bins >= n_valid
    assert lo <= n_valid - 1
