"""LAS reader/writer roundtrip and edge-case tests."""

import numpy as np
import pytest

from myria3d_tpu.pctl.io.las import (
    ExtraDim,
    LasHeader,
    get_epsg_from_vlrs,
    has_srs,
    make_wkt_vlr_for_epsg,
    read_las,
    read_las_header,
    write_las,
)


def _synthetic_points(n=1000, with_colors=True, seed=0):
    rng = np.random.default_rng(seed)
    fields = [
        ("X", "<f8"), ("Y", "<f8"), ("Z", "<f8"),
        ("Intensity", "<u2"), ("ReturnNumber", "u1"), ("NumberOfReturns", "u1"),
        ("Classification", "u1"), ("GpsTime", "<f8"),
    ]
    if with_colors:
        fields += [("Red", "<u2"), ("Green", "<u2"), ("Blue", "<u2")]
    pts = np.zeros(n, dtype=np.dtype(fields))
    pts["X"] = 862000 + rng.uniform(0, 100, n).round(2)
    pts["Y"] = 6652000 + rng.uniform(0, 100, n).round(2)
    pts["Z"] = rng.uniform(0, 30, n).round(2)
    pts["Intensity"] = rng.integers(0, 5000, n)
    pts["ReturnNumber"] = rng.integers(1, 4, n)
    pts["NumberOfReturns"] = rng.integers(1, 4, n)
    pts["Classification"] = rng.choice([1, 2, 5, 6], n)
    if with_colors:
        for c in ("Red", "Green", "Blue"):
            pts[c] = rng.integers(0, 255 * 256, n)
    return pts


@pytest.mark.parametrize("fmt,version", [(3, (1, 2)), (2, (1, 2)), (8, (1, 4))])
def test_roundtrip(tmp_path, fmt, version):
    pts = _synthetic_points(with_colors=fmt in (2, 3, 7, 8))
    header = LasHeader(
        version=version, point_format=fmt,
        scales=(0.01, 0.01, 0.01), offsets=(862000.0, 6652000.0, 0.0),
    )
    path = str(tmp_path / "rt.las")
    write_las(path, pts, header)
    data = read_las(path)
    assert len(data) == len(pts)
    np.testing.assert_allclose(data.points["X"], pts["X"], atol=0.005)
    np.testing.assert_allclose(data.points["Y"], pts["Y"], atol=0.005)
    np.testing.assert_allclose(data.points["Z"], pts["Z"], atol=0.005)
    np.testing.assert_array_equal(data.points["Classification"], pts["Classification"])
    np.testing.assert_array_equal(data.points["ReturnNumber"], pts["ReturnNumber"])
    np.testing.assert_array_equal(data.points["Intensity"], pts["Intensity"])
    if fmt in (2, 3, 7, 8):
        np.testing.assert_array_equal(data.points["Red"], pts["Red"])
    assert data.header.point_format == fmt


def test_extra_dims_roundtrip(tmp_path):
    pts = _synthetic_points(200)
    # add prediction channels as the Interpolator will
    import numpy.lib.recfunctions as rfn

    pts = rfn.append_fields(
        pts,
        ["building", "entropy", "PredictedClassification"],
        [
            np.random.rand(200).astype(np.float32),
            np.random.rand(200).astype(np.float32),
            np.random.choice([1, 2, 6], 200).astype(np.uint8),
        ],
        usemask=False,
    )
    header = LasHeader(point_format=3, offsets=(862000.0, 6652000.0, 0.0))
    path = str(tmp_path / "extra.las")
    write_las(path, pts, header, extra_dims="all")
    data = read_las(path)
    assert "building" in data.points.dtype.names
    np.testing.assert_allclose(data.points["building"], pts["building"], rtol=1e-6)
    np.testing.assert_array_equal(
        data.points["PredictedClassification"], pts["PredictedClassification"]
    )
    assert [d.name for d in data.header.extra_dims] == [
        "building", "entropy", "PredictedClassification"
    ]


def test_srs_vlr_preserved(tmp_path):
    pts = _synthetic_points(50)
    header = LasHeader(point_format=3, offsets=(862000.0, 6652000.0, 0.0))
    header.vlrs.append(make_wkt_vlr_for_epsg(2154))
    path = str(tmp_path / "srs.las")
    write_las(path, pts, header)
    h2 = read_las_header(path)
    assert has_srs(h2)
    assert get_epsg_from_vlrs(h2) == 2154

    # write again from the read header — SRS must survive the ferry
    path2 = str(tmp_path / "srs2.las")
    write_las(path2, read_las(path).points, h2)
    assert get_epsg_from_vlrs(read_las_header(path2)) == 2154


def test_header_only_read_counts(tmp_path):
    pts = _synthetic_points(321)
    path = str(tmp_path / "c.las")
    write_las(path, pts, LasHeader(point_format=3, offsets=(862000.0, 6652000.0, 0.0)))
    h = read_las_header(path)
    assert h.point_count == 321


def test_laz_rejected():
    with pytest.raises(NotImplementedError):
        read_las("/root/reference/tests/data/single-point-cloud.laz")


def test_empty_cloud_roundtrip(tmp_path):
    pts = _synthetic_points(0)
    path = str(tmp_path / "empty.las")
    write_las(path, pts, LasHeader(point_format=3))
    assert len(read_las(path)) == 0


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.las"
    p.write_bytes(b"NOPE" + b"\0" * 400)
    with pytest.raises(ValueError):
        read_las_header(str(p))
