"""Mosaic math + split/subtile extraction tests (model: reference tests/myria3d/pctl/dataset/test_utils.py)."""

import numpy as np
import pytest

from myria3d_tpu.pctl.dataset.utils import (
    get_mosaic_of_centers,
    pre_filter_below_n_points,
    split_cloud_into_samples,
)


def test_mosaic_of_centers_no_overlap():
    centers = get_mosaic_of_centers(1000, 50, 0)
    assert len(centers) == 20 * 20
    xs = sorted({c[0] for c in centers})
    assert xs[0] == 25.0 and xs[-1] == 975.0


def test_mosaic_of_centers_with_overlap():
    no = get_mosaic_of_centers(1000, 50, 0)
    ov = get_mosaic_of_centers(1000, 50, 25)
    assert len(ov) > len(no)
    # stride halves with 25m overlap
    xs = sorted({c[0] for c in ov})
    assert xs[1] - xs[0] == 25.0


def test_mosaic_negative_overlap_raises():
    with pytest.raises(ValueError):
        get_mosaic_of_centers(1000, 50, -1)


def test_split_cloud_into_samples(toy_las_path):
    samples = list(
        split_cloud_into_samples(toy_las_path, 110, 50, epsg="2154", subtile_overlap=0)
    )
    assert len(samples) >= 4
    total = sum(len(idx) for idx, _ in samples)
    # every subtile non-empty; all points covered at most once with no overlap
    for idx, pts in samples:
        assert len(idx) > 0
        assert len(pts) == len(idx)
        # square crop: xy extent within 50m + eps
        assert pts["X"].max() - pts["X"].min() <= 50.5
        assert pts["Y"].max() - pts["Y"].min() <= 50.5
    # inclusive window boundaries may double-count a few edge points
    # (reference cKDTree ball query is inclusive too)
    assert 60_000 <= total <= 61_000


@pytest.mark.parametrize("overlap", [0, 25, 45])
def test_binned_split_matches_per_center_scan(overlap):
    """The single-pass binning must reproduce the per-center Chebyshev scan
    bit-for-bit: same non-empty windows, same center order, same sorted
    point indices per window. overlap=45 (stride 5 m, 11 windows per
    axis per point) exceeds the native path's candidate buffer, so it
    exercises the numpy fallback branch."""
    rng = np.random.default_rng(11)
    n = 20_000
    pts = np.zeros(n, dtype=[("X", "<f8"), ("Y", "<f8"), ("Z", "<f8")])
    # georeferenced offsets + some points exactly on window boundaries
    pts["X"] = 862000.0 + rng.uniform(0, 110, n)
    pts["Y"] = 6652000.0 + rng.uniform(0, 110, n)
    pts["X"][:100] = 862000.0 + rng.integers(0, 3, 100) * 50.0
    pts["Y"][:100] = 6652000.0 + rng.integers(0, 3, 100) * 50.0
    pts["Z"] = rng.uniform(0, 30, n)

    got = list(split_cloud_into_samples(
        "unused", 110, 50, epsg=None, subtile_overlap=overlap, points=pts))

    # oracle: reference-style per-center scan
    xy = np.stack([pts["X"], pts["Y"]], axis=1)
    xy_rel = xy - xy.min(axis=0)
    radius = 50 // 2
    expected = []
    for center in get_mosaic_of_centers(110, 50, overlap):
        in_tile = (np.abs(xy_rel[:, 0] - center[0]) <= radius) & (
            np.abs(xy_rel[:, 1] - center[1]) <= radius)
        idx = np.flatnonzero(in_tile)
        if len(idx):
            expected.append(idx)

    assert len(got) == len(expected)
    for (gidx, gpts), eidx in zip(got, expected):
        np.testing.assert_array_equal(gidx, eidx)
        assert len(gpts) == len(eidx)


def test_pre_filter():
    assert pre_filter_below_n_points({"pos": np.zeros((0, 3))})
    assert not pre_filter_below_n_points({"pos": np.zeros((5, 3))})


def test_epsg_required(tmp_path):
    # write a LAS without SRS → reading without epsg raises
    from myria3d_tpu.pctl.io.las import LasHeader, write_las
    from myria3d_tpu.pctl.dataset.utils import read_las_array

    pts = np.zeros(5, dtype=[("X", "<f8"), ("Y", "<f8"), ("Z", "<f8"),
                             ("Classification", "u1")])
    path = str(tmp_path / "nosrs.las")
    write_las(path, pts, LasHeader(point_format=3))
    with pytest.raises(RuntimeError, match="No EPSG provided"):
        read_las_array(path, epsg=None)
    # with forced epsg it works
    arr, header = read_las_array(path, epsg="2154")
    assert len(arr) == 5
