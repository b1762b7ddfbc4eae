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


def test_layered_laz_foreign_file_reads():
    """A laszip-produced LAS 1.4 layered LAZ (compressor 3, point format 8)
    decodes through the native layered codec — container + raw-point parity
    with a foreign producer."""
    data = read_las("/root/reference/tests/data/single-point-cloud.laz")
    assert len(data.points) == 1
    assert abs(float(data.points["X"][0]) - 436049.98) < 0.01
    assert abs(float(data.points["Y"][0]) - 6383048.82) < 0.01
    assert data.points["Classification"][0] == 3
    assert data.header.point_format == 8


def test_layered_laz_reencode_bitstream_identical_to_laszip():
    """Re-encoding the foreign (PDAL/laszip-produced) layered LAZ's points
    with the native codec reproduces laszip's compressed point block
    BYTE-FOR-BYTE — chunk-table pointer, POINT14+RGBNIR14+BYTE14 layer
    structure, raw first-point encoding, per-layer size table, and the
    compressed chunk table all match the external producer exactly
    (cross-validation of the layered container against a real laszip
    bitstream; the entropy-model interiors of multi-point chunks remain
    covered by round-trip tests)."""
    from myria3d_tpu.pctl.io import las as L
    from myria3d_tpu.pctl.native import laz_compress_points

    path = "/root/reference/tests/data/single-point-cloud.laz"
    header = L.read_las_header(path)
    laszip = L._parse_laszip_vlr(header.vlrs)
    assert laszip["compressor"] == 3
    dt = L._packed_dtype(header)
    raw = L._read_laz_points(path, header, dt)
    items = [(t, s) for t, s, _v in laszip["items"]]
    blob = laz_compress_points(
        np.frombuffer(raw.tobytes(), np.uint8), header.point_count,
        header._point_offset, laszip["chunk_size"], items, layered=True,
    )
    with open(path, "rb") as f:
        original_block = f.read()[header._point_offset:]
    assert blob == original_block


# ---------------------------------------------------------------------------
# LAZ (native LASzip codec, pointwise chunked, item version 2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_laz_roundtrip_bit_identical(tmp_path, fmt):
    """LAS -> LAZ -> read is bit-identical on every dimension."""
    pts = _synthetic_points(5000, with_colors=fmt in (2, 3))
    header = LasHeader(point_format=fmt,
                       offsets=(862000.0, 6652000.0, 0.0))
    las_path = str(tmp_path / "t.las")
    laz_path = str(tmp_path / "t.laz")
    write_las(las_path, pts, header)
    write_las(laz_path, pts, header)
    a = read_las(las_path)
    b = read_las(laz_path)
    assert a.points.dtype == b.points.dtype
    for name in a.points.dtype.names:
        np.testing.assert_array_equal(a.points[name], b.points[name],
                                      err_msg=name)
    # header survives the LAZ container
    assert b.header.point_format == fmt
    assert b.header.scales == a.header.scales
    assert b.header.point_count == len(pts)


def test_laz_smaller_than_las(tmp_path):
    import os

    pts = _synthetic_points(20000)
    write_las(str(tmp_path / "t.las"), pts, LasHeader(point_format=3))
    write_las(str(tmp_path / "t.laz"), pts, LasHeader(point_format=3))
    assert os.path.getsize(tmp_path / "t.laz") < 0.7 * os.path.getsize(
        tmp_path / "t.las")


def test_laz_multichunk_and_tiny(tmp_path):
    """Chunk boundaries (50k default) and degenerate sizes round-trip."""
    from myria3d_tpu.pctl.native import (
        laz_compress_points,
        laz_decompress_points,
    )

    dt = np.dtype([("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("i", "<u2"),
                   ("bb", "u1"), ("c", "u1"), ("a", "i1"), ("u", "u1"),
                   ("p", "<u2")])
    rng = np.random.default_rng(1)
    for n, chunk in [(1, 10), (2, 10), (25, 10), (101, 10), (3, 1)]:
        pts = np.zeros(n, dtype=dt)
        pts["x"] = rng.integers(-2**30, 2**30, n).astype(np.int32)
        pts["y"] = rng.integers(-2**30, 2**30, n).astype(np.int32)
        pts["z"] = rng.integers(-2**20, 2**20, n).astype(np.int32)
        pts["bb"] = (rng.integers(1, 6, n) | (rng.integers(1, 6, n) << 3)).astype(np.uint8)
        pts["c"] = rng.integers(0, 32, n)
        blob = laz_compress_points(pts, n, 0, chunk, [(6, 20)])
        out = laz_decompress_points(bytes(blob), 0, n, chunk, [(6, 20)])
        back = np.frombuffer(out.tobytes(), dtype=dt)
        for f in dt.names:
            np.testing.assert_array_equal(back[f], pts[f], err_msg=f"{f} n={n}")


def test_laz_extreme_coordinate_jumps(tmp_path):
    """i32-extreme deltas exercise the k=32 corrector path."""
    dt = np.dtype([("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("i", "<u2"),
                   ("bb", "u1"), ("c", "u1"), ("a", "i1"), ("u", "u1"),
                   ("p", "<u2")])
    pts = np.zeros(8, dtype=dt)
    pts["x"] = [0, 2**31 - 1, -2**31, 0, -1, 1, 2**31 - 1, -2**31]
    pts["y"] = pts["x"][::-1].copy()
    pts["z"] = [0, -2**31, 2**31 - 1, 5, 0, 0, 1, -1]
    pts["bb"] = 1 | (1 << 3)
    from myria3d_tpu.pctl.native import (
        laz_compress_points,
        laz_decompress_points,
    )

    blob = laz_compress_points(pts, 8, 0, 50000, [(6, 20)])
    out = laz_decompress_points(bytes(blob), 0, 8, 50000, [(6, 20)])
    back = np.frombuffer(out.tobytes(), dtype=dt)
    for f in dt.names:
        np.testing.assert_array_equal(back[f], pts[f], err_msg=f)


def test_laz_with_extra_bytes_roundtrip(tmp_path):
    """Extra-bytes dims ride the BYTE item and survive bit-exactly."""
    pts = _synthetic_points(3000)
    names = list(pts.dtype.names)
    aug = np.zeros(len(pts), dtype=np.dtype(
        pts.dtype.descr + [("entropy", "<f4"), ("building", "<f4")]))
    for f in names:
        aug[f] = pts[f]
    rng = np.random.default_rng(3)
    aug["entropy"] = rng.random(len(pts)).astype(np.float32)
    aug["building"] = rng.random(len(pts)).astype(np.float32)
    laz_path = str(tmp_path / "e.laz")
    write_las(laz_path, aug, LasHeader(point_format=3))
    back = read_las(laz_path)
    for f in ("entropy", "building", "GpsTime"):  # stored unquantized
        np.testing.assert_array_equal(back.points[f], aug[f], err_msg=f)
    for f in ("X", "Y", "Z"):  # scale-quantized like any LAS write
        np.testing.assert_allclose(back.points[f], aug[f], atol=0.006,
                                   err_msg=f)


def test_layered_laz_vlr_spec_layout(tmp_path):
    """The laszip VLR of a layered write carries compressor 3 / item
    version 3 at the spec offsets (chunk_size @12 etc. — a foreign reader
    must be able to parse it)."""
    from myria3d_tpu.pctl.io.las import _parse_laszip_vlr

    pts = _synthetic_points(10, with_colors=True)
    laz_path = str(tmp_path / "x.laz")
    write_las(laz_path, pts, LasHeader(version=(1, 4), point_format=8))
    h = read_las_header(laz_path)
    vlr = _parse_laszip_vlr(h.vlrs)
    assert vlr["compressor"] == 3
    assert vlr["chunk_size"] == 50000
    assert all(ver == 3 for _t, _s, ver in vlr["items"])
    assert [t for t, _s, _v in vlr["items"]] == [10, 12]


def test_las_written_from_laz_source_has_no_laszip_vlr(tmp_path):
    """A .las written from a header that came from a .laz must not carry the
    stale laszip VLR (it would be mis-detected as compressed)."""
    pts = _synthetic_points(100)
    laz_path = str(tmp_path / "s.laz")
    write_las(laz_path, pts, LasHeader(point_format=3))
    src = read_las(laz_path)
    las_path = str(tmp_path / "o.las")
    write_las(las_path, src.points, header=src.header)
    out = read_las(las_path)  # would raise if mis-detected as LAZ
    assert len(out.points) == 100
    assert not any(v.user_id.startswith("laszip") for v in out.header.vlrs)


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


# ---------------------------------------------------------------------------
# Layered LAZ (compressor 3, item version 3 — LAS 1.4 point formats 6-8)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", [6, 7, 8])
def test_layered_laz_roundtrip_bit_identical(tmp_path, fmt):
    """LAS 1.4 -> layered LAZ -> read is bit-identical on every dimension."""
    pts = _synthetic_points(5000, with_colors=fmt in (7, 8))
    header = LasHeader(version=(1, 4), point_format=fmt,
                       offsets=(862000.0, 6652000.0, 0.0))
    las_path = str(tmp_path / "t.las")
    laz_path = str(tmp_path / "t.laz")
    write_las(las_path, pts, header)
    write_las(laz_path, pts, header)
    a = read_las(las_path)
    b = read_las(laz_path)
    assert a.points.dtype == b.points.dtype
    for name in a.points.dtype.names:
        np.testing.assert_array_equal(a.points[name], b.points[name],
                                      err_msg=name)
    assert b.header.point_format == fmt


def test_layered_laz_roundtrip_multichunk_with_extra_bytes(tmp_path):
    """>50k points (several layered chunks) + extra dims through BYTE14."""
    pts_base = _synthetic_points(120_000, with_colors=True)
    dt = np.dtype(pts_base.dtype.descr + [("entropy", "<f4")])
    pts = np.zeros(len(pts_base), dtype=dt)
    for nm in pts_base.dtype.names:
        pts[nm] = pts_base[nm]
    pts["entropy"] = np.random.default_rng(1).random(len(pts)).astype("<f4")
    header = LasHeader(version=(1, 4), point_format=8,
                       offsets=(862000.0, 6652000.0, 0.0))
    laz_path = str(tmp_path / "m.laz")
    write_las(laz_path, pts, header, extra_dims="all")
    back = read_las(laz_path)
    assert len(back.points) == len(pts)
    np.testing.assert_allclose(back.points["X"], pts["X"], atol=0.005)
    np.testing.assert_array_equal(back.points["Classification"],
                                  pts["Classification"])
    np.testing.assert_array_equal(back.points["entropy"], pts["entropy"])


@pytest.mark.parametrize("fmt", [3, 8])
def test_laz_variable_size_chunks_roundtrip(tmp_path, fmt, monkeypatch):
    """Variable-size chunking (VLR chunk_size == U32_MAX): the chunk table
    carries interleaved per-chunk point counts + byte sizes. Both the
    pointwise (fmt 0-3) and layered (fmt 6-8) decoders must locate chunks
    from the decoded counts; 12k points over the writer's varying
    1500/4000/700/2600 pattern crosses several chunk boundaries."""
    import myria3d_tpu.pctl.io.las as las_mod

    pts = _synthetic_points(12_000, with_colors=True)
    header = LasHeader(
        version=(1, 4) if fmt >= 6 else (1, 2), point_format=fmt,
        offsets=(862000.0, 6652000.0, 0.0),
    )
    las_path = str(tmp_path / "v.las")
    laz_path = str(tmp_path / "v.laz")
    write_las(las_path, pts, header)
    monkeypatch.setattr(las_mod, "LAZ_CHUNK_SIZE", -1)
    write_las(laz_path, pts, header)
    # the laszip VLR really records variable chunking
    h = read_las_header(laz_path)
    from myria3d_tpu.pctl.io.las import _parse_laszip_vlr

    laszip = _parse_laszip_vlr(h.vlrs)
    assert laszip is not None and laszip["chunk_size"] == -1
    a = read_las(las_path)
    b = read_las(laz_path)
    assert a.points.dtype == b.points.dtype
    for name in a.points.dtype.names:
        np.testing.assert_array_equal(a.points[name], b.points[name],
                                      err_msg=name)


def test_laz_variable_chunks_corrupt_table_fails_fast(tmp_path, monkeypatch):
    """A crafted variable-chunk table must be rejected BEFORE any unbounded
    work: number_chunks=2^32-1 would otherwise drive ~4.3e9 decode
    iterations (~69 GB of table growth), and a negative decoded chunk size
    would walk the read cursor out of the file."""
    import struct as _struct

    import myria3d_tpu.pctl.io.las as las_mod

    pts = _synthetic_points(6_000, with_colors=True)
    laz_path = str(tmp_path / "v.laz")
    monkeypatch.setattr(las_mod, "LAZ_CHUNK_SIZE", -1)
    write_las(laz_path, pts, LasHeader(version=(1, 4), point_format=8))
    blob = bytearray(open(laz_path, "rb").read())
    h = read_las_header(laz_path)
    point_off = h._point_offset
    table_off = _struct.unpack_from("<Q", blob, point_off)[0]

    # chunk count far beyond the point count -> immediate rejection
    bad = bytearray(blob)
    _struct.pack_into("<I", bad, table_off + 4, 0xFFFFFFFF)
    p = tmp_path / "huge_chunks.laz"
    p.write_bytes(bytes(bad))
    import time as _time

    t0 = _time.perf_counter()
    with pytest.raises(Exception):
        read_las(str(p))
    assert _time.perf_counter() - t0 < 10.0  # fails fast, no unbounded loop

    # garbled table payload (counts/sizes stream) -> loud failure too
    bad2 = bytearray(blob)
    for i in range(table_off + 8, min(table_off + 24, len(bad2))):
        bad2[i] ^= 0xFF
    p2 = tmp_path / "garbled_table.laz"
    p2.write_bytes(bytes(bad2))
    with pytest.raises(Exception):
        read_las(str(p2))


def test_laz_corrupt_streams_fail_loudly(tmp_path):
    """Bit flips / truncation in the compressed block must surface as
    exceptions (never crashes, hangs, or silent garbage acceptance) —
    the decoder guards chunk bounds, counts, and layer sizes."""
    pts = _synthetic_points(20_000, with_colors=True)
    laz_path = str(tmp_path / "f.laz")
    write_las(laz_path, pts, LasHeader(version=(1, 4), point_format=8))
    blob = bytearray(open(laz_path, "rb").read())
    h = read_las_header(laz_path)
    point_off = h._point_offset

    rng = np.random.default_rng(9)
    failures = 0
    trials = 12
    for t in range(trials):
        bad = bytearray(blob)
        if t % 3 == 0:      # truncate inside the point block
            bad = bad[: point_off + int(rng.integers(16, len(bad) - point_off))]
        elif t % 3 == 1:    # flip bytes in the chunk-table pointer / table
            for _ in range(4):
                i = int(rng.integers(point_off, point_off + 8))
                bad[i] ^= 0xFF
        else:               # flip bytes mid-stream
            for _ in range(8):
                i = int(rng.integers(point_off + 16, len(bad) - 1))
                bad[i] ^= int(rng.integers(1, 255))
        p = str(tmp_path / f"bad{t}.laz")
        open(p, "wb").write(bytes(bad))
        try:
            out = read_las(p)
            # surviving a mid-stream flip is acceptable only if the data
            # still has the right point count (arithmetic streams can
            # absorb flips into wrong-but-bounded values)
            assert len(out.points) == len(pts)
        except (ValueError, RuntimeError, NotImplementedError):
            failures += 1
    assert failures >= trials // 3  # truncations/table damage must raise


def test_extra_columns_passthrough(tmp_path):
    """``extra_columns`` writes derived channels without a widened record
    array, equivalent to pre-merging them into the points; a colliding
    name overrides the points' own field."""
    pts = _synthetic_points(300)
    import numpy.lib.recfunctions as rfn

    stale = np.zeros(300, np.float32)
    pts_with_stale = rfn.append_fields(pts, "entropy", stale, usemask=False)
    cols = {
        "building": np.random.rand(300).astype(np.float32),
        "PredictedClassification": np.random.choice([1, 2, 6], 300).astype(np.uint8),
        "entropy": np.random.rand(300).astype(np.float32),  # overrides stale
    }
    path = str(tmp_path / "cols.las")
    write_las(
        path, pts_with_stale,
        LasHeader(point_format=3, offsets=(862000.0, 6652000.0, 0.0)),
        extra_columns=cols,
    )
    out = read_las(path).points
    names = out.dtype.names
    assert [n for n in names if n in cols] == list(cols)
    for name, vals in cols.items():
        np.testing.assert_array_equal(out[name], vals)
    # wrong length fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="extra column"):
        write_las(
            str(tmp_path / "bad.las"), pts,
            LasHeader(point_format=3, offsets=(862000.0, 6652000.0, 0.0)),
            extra_columns={"oops": np.zeros(5, np.float32)},
        )


@pytest.mark.parametrize("fmt,compressed", [(3, False), (8, False), (3, True)])
def test_native_unpack_parity_with_numpy_path(tmp_path, fmt, compressed, monkeypatch):
    """The fused C++ record unpack (``pctl_native.las_unpack_records``) must be
    byte-identical to the generic numpy per-field conversion, for both the f64
    named read and the f32 fast read, LAS and LAZ, old and new point formats."""
    import myria3d_tpu.pctl.io.las as las_mod
    from myria3d_tpu.pctl.io.las import read_las_float32
    from myria3d_tpu.pctl import native as native_mod

    if native_mod.get_lib() is None:
        pytest.skip("native library unavailable")

    pts = _synthetic_points(2000, with_colors=fmt in (2, 3, 7, 8))
    header = LasHeader(
        version=(1, 4) if fmt >= 6 else (1, 2), point_format=fmt,
        scales=(0.01, 0.01, 0.01), offsets=(862000.0, 6652000.0, 0.0),
    )
    path = str(tmp_path / ("p.laz" if compressed else "p.las"))
    write_las(path, pts, header)

    native_64 = read_las(path).points
    native_32 = read_las_float32(path).points

    monkeypatch.setattr(
        las_mod, "_read_unpacked_native", lambda *a, **k: None
    )
    numpy_64 = read_las(path).points
    numpy_32 = read_las_float32(path).points

    assert native_64.dtype == numpy_64.dtype
    assert native_32.dtype == numpy_32.dtype
    for name in numpy_64.dtype.names:
        np.testing.assert_array_equal(native_64[name], numpy_64[name], err_msg=name)
    for name in numpy_32.dtype.names:
        np.testing.assert_array_equal(native_32[name], numpy_32[name], err_msg=name)


@pytest.mark.parametrize("fmt,compressed", [(3, False), (6, False), (8, False), (3, True)])
def test_native_pack_byte_parity_with_numpy_path(tmp_path, fmt, compressed, monkeypatch):
    """The fused C++ record pack (``pctl_native.las_pack_records``) must
    produce a byte-identical FILE to the generic numpy write path — headers,
    bitfield packing, XYZ grid rounding (half-to-even), extra dims, LAS and
    LAZ (the codec consumes the packed records)."""
    import myria3d_tpu.pctl.io.las as las_mod
    from myria3d_tpu.pctl import native as native_mod

    if native_mod.get_lib() is None:
        pytest.skip("native library unavailable")

    n = 3000
    rng = np.random.default_rng(5)
    pts = _synthetic_points(n, with_colors=fmt in (2, 3, 7, 8))
    header = LasHeader(
        version=(1, 4) if fmt >= 6 else (1, 2), point_format=fmt,
        scales=(0.01, 0.01, 0.01), offsets=(862000.0, 6652000.0, 0.0),
    )
    extra = {
        "building": rng.random(n).astype(np.float32),
        "PredictedClassification": rng.integers(0, 10, n).astype(np.uint8),
        "entropy": rng.random(n).astype(np.float32),
    }
    name = "p.laz" if compressed else "p.las"
    p_nat = str(tmp_path / ("nat_" + name))
    p_np = str(tmp_path / ("np_" + name))
    write_las(p_nat, pts, header, extra_columns=extra)
    monkeypatch.setattr(las_mod, "_native_pack_table", lambda *a, **k: None)
    write_las(p_np, pts, header, extra_columns=extra)

    with open(p_nat, "rb") as f:
        a = f.read()
    with open(p_np, "rb") as f:
        b = f.read()
    assert a == b
