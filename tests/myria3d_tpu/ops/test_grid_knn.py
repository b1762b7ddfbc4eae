"""Grid-binned kNN correctness vs the dense exact path (small N; the grid
path targets TPU-scale clouds but semantics are size-independent)."""

import jax.numpy as jnp
import numpy as np

from myria3d_tpu.ops.grid_knn import grid_knn
from myria3d_tpu.ops.knn import knn


def _recall(idx, eidx, valid, k):
    hits, total = 0, 0
    for i in np.argwhere(valid[:, 0]).ravel():
        hits += len(set(idx[i]) & set(eidx[i]))
        total += k
    return hits / max(total, 1)


def test_grid_knn_high_recall_vs_exact():
    rng = np.random.default_rng(0)
    B, N, K = 2, 1024, 8
    pos = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    pos[..., 2] *= 0.2  # aerial: thin z
    mask = np.ones((B, N), dtype=bool)
    mask[1, 700:] = False
    idx, d2, nv = grid_knn(
        jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(mask), K,
        query_mask=jnp.asarray(mask),
    )
    eidx, ed2, env = knn(
        jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(mask), K,
        query_mask=jnp.asarray(mask), exact=True,
    )
    idx, eidx = np.asarray(idx), np.asarray(eidx)
    nv = np.asarray(nv)
    for b in range(B):
        rec = _recall(idx[b], eidx[b], nv[b], K)
        assert rec > 0.97, rec
    # pads never appear as neighbors
    sel = idx[1][nv[1]]
    assert (sel < 700).all()
    # self-loop first for valid queries
    assert (idx[0][:, 0] == np.arange(N)).mean() > 0.99


def test_grid_knn_cross_sets():
    rng = np.random.default_rng(1)
    B, Ns, Nt, K = 1, 512, 1024, 4
    src = rng.uniform(-1, 1, (B, Ns, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (B, Nt, 3)).astype(np.float32)
    mask = np.ones((B, Ns), dtype=bool)
    idx, d2, nv = grid_knn(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(mask), K)
    eidx, _, _ = knn(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(mask), K,
                     exact=True)
    rec = _recall(np.asarray(idx)[0], np.asarray(eidx)[0], np.asarray(nv)[0], K)
    assert rec > 0.95, rec


def test_grid_knn_empty_cloud():
    pos = np.zeros((1, 256, 3), np.float32)
    mask = np.zeros((1, 256), bool)
    idx, d2, nv = grid_knn(jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(mask), 4)
    assert not np.asarray(nv).any()
