"""Graph-reuse interpolation vs dense exact kNN interpolation.

The candidate set (own voxel sample + its 16 graph neighbors) must contain
(nearly) all true k=10 neighbors on grid-sampled data, so interpolated
values track the dense path closely.
"""

import jax.numpy as jnp
import numpy as np

from myria3d_tpu.ops.graph_interp import graph_interpolate
from myria3d_tpu.ops.interpolate import knn_interpolate
from myria3d_tpu.ops.knn import knn_graph


def _grid_sampled_cloud(rng, n_full=4000, voxel=0.25):
    """Synthetic 'raw cloud + voxel means' pair like GridSampling output."""
    full = rng.uniform(0, 12.5, (n_full, 3)).astype(np.float32)
    coords = np.floor(full / voxel).astype(np.int64)
    _, inverse, counts = np.unique(
        coords, axis=0, return_inverse=True, return_counts=True
    )
    inverse = inverse.ravel().astype(np.int32)
    n_vox = len(counts)
    sampled = np.zeros((n_vox, 3), np.float64)
    np.add.at(sampled, inverse, full)
    sampled = (sampled / counts[:, None]).astype(np.float32)
    return full, sampled, inverse


def test_graph_interp_close_to_dense():
    rng = np.random.default_rng(0)
    full, sampled, inverse = _grid_sampled_cloud(rng)
    ns, m = len(sampled), len(full)
    feats = rng.normal(size=(ns, 5)).astype(np.float32)

    s_pos = jnp.asarray(sampled)[None]
    s_mask = jnp.ones((1, ns), bool)
    f_pos = jnp.asarray(full)[None]
    f_mask = jnp.ones((1, m), bool)
    x = jnp.asarray(feats)[None]
    f2s = jnp.asarray(inverse)[None]

    gidx, _, gvalid = knn_graph(s_pos, s_mask, 16)
    ours = np.asarray(
        graph_interpolate(x, s_pos, s_mask, gidx, gvalid, f_pos, f2s, f_mask)
    )[0]
    dense = np.asarray(
        knn_interpolate(x, s_pos, s_mask, f_pos, f_mask, k=10)
    )[0]
    # candidate sets cover nearly all true neighbors -> values very close
    err = np.abs(ours - dense).max(axis=1)
    rel = err / (np.abs(dense).max() + 1e-6)
    assert np.quantile(rel, 0.95) < 0.05, np.quantile(rel, 0.95)
    assert np.mean(rel) < 0.01, np.mean(rel)


def test_graph_interp_masks_and_missing_mapping():
    rng = np.random.default_rng(1)
    full, sampled, inverse = _grid_sampled_cloud(rng, n_full=800)
    ns, m = len(sampled), len(full)
    x = jnp.asarray(rng.normal(size=(1, ns, 3)).astype(np.float32))
    s_pos = jnp.asarray(sampled)[None]
    s_mask = jnp.ones((1, ns), bool)
    f_pos = jnp.asarray(full)[None]
    f_mask = np.ones((1, m), bool)
    f_mask[0, -50:] = False
    f2s = inverse.copy()
    f2s[:10] = -1  # broken mapping (e.g. dropped voxels)
    gidx, _, gvalid = knn_graph(s_pos, s_mask, 8)
    out = np.asarray(
        graph_interpolate(
            x, s_pos, s_mask, gidx, gvalid, f_pos,
            jnp.asarray(f2s)[None], jnp.asarray(f_mask),
        )
    )[0]
    assert (out[:10] == 0).all()      # unmapped -> zeros
    assert (out[-50:] == 0).all()     # masked targets -> zeros
    assert np.isfinite(out).all()


def test_full_to_sampled_plumbing_through_transforms():
    """GridSampling stashes the map; Min/MaxNumNodes remap it."""
    from myria3d_tpu.pctl.transforms.transforms import (
        CopyFullPos,
        GridSampling,
        MaximumNumNodes,
        MinimumNumNodes,
    )

    rng = np.random.default_rng(2)
    n = 3000
    data = {
        "pos": rng.uniform(0, 25, (n, 3)).astype(np.float32),
        "x": rng.normal(size=(n, 3)).astype(np.float32),
        "y": rng.integers(0, 7, n).astype(np.int32),
    }
    data = CopyFullPos()(data)
    data = GridSampling(0.5)(data)
    f2s = data["copies"]["full_to_sampled"]
    assert f2s.shape == (n,)
    ns = data["pos"].shape[0]
    assert f2s.min() >= 0 and f2s.max() < ns
    # mapping points at the voxel containing each full point
    d = np.linalg.norm(
        data["copies"]["pos_copy"] - data["pos"][f2s], axis=1
    )
    assert d.max() < 0.5 * np.sqrt(3) + 1e-5

    # cap to fewer points: dropped voxels map to -1, survivors stay exact
    data2 = MaximumNumNodes(ns // 2)(data)
    f2s2 = data2["copies"]["full_to_sampled"]
    kept = f2s2 >= 0
    assert kept.any() and (~kept).any()
    np.testing.assert_allclose(
        data2["copies"]["pos_copy"][kept][:50],
        data2["copies"]["pos_copy"][kept][:50],
    )
    d2 = np.linalg.norm(
        data2["copies"]["pos_copy"][kept] - data2["pos"][f2s2[kept]], axis=1
    )
    assert d2.max() < 0.5 * np.sqrt(3) + 1e-5

    # duplication keeps first occurrence
    data3 = MinimumNumNodes(2 * data2["pos"].shape[0])(data2)
    f2s3 = data3["copies"]["full_to_sampled"]
    kept3 = f2s3 >= 0
    assert (f2s3[kept3] < data2["pos"].shape[0]).all()
