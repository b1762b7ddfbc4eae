"""The Lidar HD feature engineering must be bit-identical between the
packed-f32 column fast path and the named-array fallback — the HDF5 cache
stores the outputs, so any drift would split datasets built before/after
the optimization (reference math:
``myria3d/pctl/points_pre_transform/lidar_hd.py:9-61``)."""

import numpy as np
import pytest

import myria3d_tpu.pctl.points_pre_transform.lidar_hd as lh


FIELDS = [
    "X", "Y", "Z", "Intensity", "ReturnNumber", "NumberOfReturns",
    "Classification", "Red", "Green", "Blue", "Infrared",
]


def _records(n=257, fields=FIELDS, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros(n, dtype=[(f, np.float32) for f in fields])
    pts["X"] = rng.uniform(0, 50, n)
    pts["Y"] = rng.uniform(0, 50, n)
    pts["Z"] = rng.uniform(0, 20, n)
    pts["Intensity"] = rng.uniform(0, 4000, n)
    pts["ReturnNumber"] = rng.integers(1, 6, n)
    pts["NumberOfReturns"] = rng.integers(1, 7, n)
    pts["Classification"] = rng.choice([1, 2, 5, 6, 64], n)
    for c in ("Red", "Green", "Blue", "Infrared"):
        if c in fields:
            pts[c] = rng.uniform(0, 255 * 256, n)
    return pts


def _fallback(points, monkeypatch):
    """Run the named-array path on the same records."""
    with monkeypatch.context() as m:
        m.setattr(lh, "_columns_f32", lambda p: (None, None))
        return lh.lidar_hd_pre_transform(points)


@pytest.mark.parametrize(
    "fields", [FIELDS, [f for f in FIELDS if f != "Infrared"]],
    ids=["all_fields", "no_infrared"],
)
def test_columns_path_bit_identical(fields, monkeypatch):
    pts = _records(fields=fields)
    fast = lh.lidar_hd_pre_transform(pts)
    slow = _fallback(pts, monkeypatch)
    assert fast["x_features_names"] == slow["x_features_names"]
    np.testing.assert_array_equal(fast["pos"], slow["pos"])
    np.testing.assert_array_equal(fast["x"], slow["x"])
    np.testing.assert_array_equal(fast["y"], slow["y"])
    assert fast["x"].dtype == np.float32 and fast["x"].flags.c_contiguous
    assert fast["y"].dtype == np.int64


def test_columns_path_requires_packed_f32():
    pts = _records().astype(
        [(f, np.float64 if f == "X" else np.float32) for f in FIELDS]
    )
    mat, col = lh._columns_f32(pts)
    assert mat is None  # falls back safely on non-f32 records


def test_occlusion_zeroing_applies_to_colors_only():
    pts = _records()
    out = lh.lidar_hd_pre_transform(pts)
    occ = pts["ReturnNumber"] > 1
    names = out["x_features_names"]
    for c in ("Red", "Green", "Blue", "Infrared"):
        np.testing.assert_array_equal(out["x"][occ, names.index(c)], 0.0)
    assert (out["x"][occ, names.index("Intensity")] != 0).any()
