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


@pytest.mark.parametrize("src_dtype", [np.float32, np.float16])
def test_scatter_add_rows_matches_numpy(src_dtype):
    """Thread-parallel row scatter (unique indices) == numpy fancy add,
    including the in-flight f16 -> f32 upcast of the wire logits."""
    from myria3d_tpu.pctl.native import get_lib, native_scatter_add_rows

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    n, c, r = 5000, 7, 1200
    plane = rng.normal(size=(n, c)).astype(np.float32)
    ref = plane.copy()
    idx = np.sort(rng.choice(n, r, replace=False)).astype(np.int64)
    src = rng.normal(size=(r, c)).astype(src_dtype)
    assert native_scatter_add_rows(plane, idx, src)
    ref[idx] += src.astype(np.float32)
    np.testing.assert_array_equal(plane, ref)


def test_logits_finalize_matches_numpy_chain():
    """Fused softmax/argmax/entropy == the numpy formulation it replaces
    (probas/entropy to fp tolerance; predicted codes exactly)."""
    from myria3d_tpu.pctl.native import get_lib, native_logits_finalize

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    n, c = 20000, 7
    logits = rng.normal(0, 4, size=(n, c)).astype(np.float32)
    logits[0] = 0.0          # all-uncovered row: uniform softmax
    logits[1] = [100, -100, 0, 0, 0, 0, 0]  # near-one-hot: H clips at 0
    class_map = np.asarray([1, 2, 5, 6, 9, 17, 64], np.uint8)

    out = native_logits_finalize(logits, class_map)
    assert out is not None
    probas, preds, ent = out

    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    z = e.sum(axis=1, keepdims=True)
    probas_ref = e / z
    preds_ref = class_map[np.argmax(probas_ref, axis=1)]
    ent_ref = (
        np.log(z[:, 0]) + m[:, 0] - np.einsum("nc,nc->n", probas_ref, logits)
    ).astype(np.float32)
    np.maximum(ent_ref, 0.0, out=ent_ref)

    np.testing.assert_allclose(probas, probas_ref, rtol=2e-6, atol=1e-7)
    np.testing.assert_array_equal(preds, preds_ref)
    np.testing.assert_allclose(ent, ent_ref, rtol=1e-5, atol=2e-6)
    assert probas.sum(axis=1) == pytest.approx(1.0, abs=1e-5)


def test_logits_finalize_optional_outputs():
    from myria3d_tpu.pctl.native import get_lib, native_logits_finalize

    if get_lib() is None:
        pytest.skip("native library unavailable")
    logits = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cm = np.asarray([1, 2, 6], np.uint8)
    probas, preds, ent = native_logits_finalize(
        logits, cm, want_preds=False, want_entropy=False
    )
    assert preds is None and ent is None
    assert probas.shape == (50, 3)
