"""C++ pctl_native kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from myria3d_tpu.pctl.native import (
    get_lib,
    native_crop_square,
    native_grid_sample,
)
from myria3d_tpu.pctl.transforms.transforms import GridSampling

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C++ toolchain for pctl_native"
)


def _numpy_grid_sample(data, size):
    """Run the transform's numpy path by bypassing the native branch."""
    gs = GridSampling(size)
    gs._try_native = lambda data: None  # force numpy
    return gs(dict(data))


def test_grid_sample_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    data = {
        "pos": rng.uniform(0, 50, (n, 3)).astype(np.float32),
        "x": rng.normal(size=(n, 9)).astype(np.float32),
        "y": rng.integers(0, 7, n).astype(np.int32),
    }
    ref = _numpy_grid_sample(data, 0.25)
    out = GridSampling(0.25)(dict(data))
    assert out["pos"].shape == ref["pos"].shape
    np.testing.assert_allclose(out["pos"], ref["pos"], atol=1e-4)
    np.testing.assert_allclose(out["x"], ref["x"], atol=1e-4)
    np.testing.assert_array_equal(out["y"], ref["y"])


def test_grid_sample_majority_tie_smallest_code():
    # two points in one voxel with different labels -> smallest code wins
    data = {
        "pos": np.array([[0.0, 0, 0], [0.01, 0, 0], [5, 5, 5]], np.float32),
        "y": np.array([6, 2, 1], np.int32),
    }
    res = native_grid_sample(data["pos"], None, data["y"], 0.25)
    assert res is not None
    out_pos, _, out_y, inverse = res
    assert out_pos.shape[0] == 2
    assert out_y[inverse[0]] == 2  # tie between 6 and 2 -> 2
    assert out_y[inverse[2]] == 1


def test_grid_sample_extra_keys_aggregated():
    rng = np.random.default_rng(1)
    n = 1000
    data = {
        "pos": rng.uniform(0, 10, (n, 3)).astype(np.float32),
        "x": rng.normal(size=(n, 4)).astype(np.float32),
        "y": rng.integers(0, 5, n).astype(np.int32),
        "extra_scalar": rng.normal(size=n).astype(np.float32),
    }
    ref = _numpy_grid_sample(data, 0.5)
    out = GridSampling(0.5)(dict(data))
    np.testing.assert_allclose(
        out["extra_scalar"], ref["extra_scalar"], atol=1e-4
    )


def test_crop_square_matches_numpy():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 100, (10000, 3)).astype(np.float32)
    idx = native_crop_square(pos, 50.0, 50.0, 25.0)
    assert idx is not None
    ref = np.flatnonzero(
        (np.abs(pos[:, 0] - 50) <= 25) & (np.abs(pos[:, 1] - 50) <= 25)
    )
    np.testing.assert_array_equal(np.sort(idx), ref)
