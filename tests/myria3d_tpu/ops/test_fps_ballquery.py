"""FPS + ball-query kernel tests (numpy oracles + masking invariants)."""

import jax.numpy as jnp
import numpy as np

from myria3d_tpu.ops import ball_query, farthest_point_sampling


def test_fps_selects_valid_unique_and_spread():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (2, 256, 3)).astype(np.float32)
    mask = np.ones((2, 256), dtype=bool)
    mask[1, 100:] = False
    idx, new_mask = farthest_point_sampling(jnp.asarray(pos), jnp.asarray(mask), 64)
    idx, new_mask = np.asarray(idx), np.asarray(new_mask)
    assert idx.shape == (2, 64)
    assert new_mask.all(axis=1)[0] and new_mask[1].sum() == 64
    for b in range(2):
        sel = idx[b][new_mask[b]]
        assert len(set(sel.tolist())) == len(sel)          # unique
        assert mask[b][sel].all()                           # valid only
    # FPS spreads better than the first-M prefix: compare min pairwise dist
    sel_pos = pos[0][idx[0]]
    pref_pos = pos[0][:64]

    def min_pair(p):
        d = ((p[:, None] - p[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.min()

    assert min_pair(sel_pos) > min_pair(pref_pos)


def test_fps_fewer_valid_than_m():
    pos = np.random.default_rng(1).uniform(-1, 1, (1, 128, 3)).astype(np.float32)
    mask = np.zeros((1, 128), dtype=bool)
    mask[0, :10] = True
    idx, new_mask = farthest_point_sampling(jnp.asarray(pos), jnp.asarray(mask), 32)
    assert np.asarray(new_mask).sum() == 10


def test_fps_deterministic():
    pos = np.random.default_rng(2).uniform(-1, 1, (1, 128, 3)).astype(np.float32)
    mask = np.ones((1, 128), dtype=bool)
    i1, _ = farthest_point_sampling(jnp.asarray(pos), jnp.asarray(mask), 32)
    i2, _ = farthest_point_sampling(jnp.asarray(pos), jnp.asarray(mask), 32)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_ball_query_radius_and_mask():
    rng = np.random.default_rng(3)
    key_pos = rng.uniform(-1, 1, (1, 256, 3)).astype(np.float32)
    centroids = key_pos[:, :16]
    mask = np.ones((1, 256), dtype=bool)
    mask[0, 200:] = False
    r = 0.3
    idx, d2, nv = ball_query(
        jnp.asarray(centroids), jnp.asarray(key_pos), jnp.asarray(mask), 8, r
    )
    idx, d2, nv = np.asarray(idx), np.asarray(d2), np.asarray(nv)
    # all valid neighbors within radius, valid keys only
    assert (d2[nv] <= r * r + 1e-6).all()
    assert (idx[nv] < 200).all()
    # centroid itself (distance 0) always grouped
    assert nv[0, :, 0].all()
    np.testing.assert_allclose(d2[0, :, 0], 0.0, atol=1e-5)
