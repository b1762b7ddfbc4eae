"""Self-contained LAS 1.2–1.4 reader/writer on numpy (no PDAL/laspy).

Replaces the reference's PDAL usage (reference ``myria3d/pctl/dataset/utils.py:41-120``,
``myria3d/models/interpolation.py:60-91,176-184``): LAS read to a PDAL-style
named numpy array (scaled float64 X/Y/Z, PDAL dimension names), LAS write with
header/VLR/SRS passthrough, and "extra bytes" dimensions for writing predicted
classification / per-class probabilities / entropy back into new LAS dims.

Point formats 0–3 (LAS 1.2/1.3) and 6–8 (LAS 1.4) are supported, plus
arbitrary extra-bytes dimensions. LAZ is read AND written for point formats
0–3 (pointwise-chunked compressor 2, item version 2) and 6–8 (LAS 1.4
layered compressor 3, item version 3) through the self-contained native
LASzip codec (``pctl/native/laszip_native.cpp``) — French Lidar HD's
production distribution formats. The layered container layout is validated
against laszip-produced files; the v3 entropy models are reconstructed from
the LASzip specification with a per-layer consumption guard that turns any
producer/model mismatch into a hard error instead of silent corruption.

This module is pure host-side I/O — it never touches the accelerator.
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "LasHeader",
    "LasVLR",
    "LasData",
    "read_las",
    "read_las_header",
    "write_las",
    "ExtraDim",
    "has_srs",
    "get_epsg_from_vlrs",
    "make_wkt_vlr_for_epsg",
]

_HEADER_SIZES = {(1, 2): 227, (1, 3): 235, (1, 4): 375}

# Standard point record layouts: list of (name, numpy dtype) for the packed
# struct, with bitfield bytes handled separately.
_XYZ = [("X_raw", "<i4"), ("Y_raw", "<i4"), ("Z_raw", "<i4")]

_FMT_FIELDS: Dict[int, List[Tuple[str, str]]] = {
    0: _XYZ
    + [
        ("Intensity", "<u2"),
        ("flags", "u1"),
        ("raw_classification", "u1"),
        ("ScanAngleRank", "i1"),
        ("UserData", "u1"),
        ("PointSourceId", "<u2"),
    ],
    6: _XYZ
    + [
        ("Intensity", "<u2"),
        ("returns", "u1"),
        ("flags", "u1"),
        ("Classification", "u1"),
        ("UserData", "u1"),
        ("ScanAngle", "<i2"),
        ("PointSourceId", "<u2"),
    ],
}
_FMT_FIELDS[1] = _FMT_FIELDS[0] + [("GpsTime", "<f8")]
_FMT_FIELDS[2] = _FMT_FIELDS[0] + [("Red", "<u2"), ("Green", "<u2"), ("Blue", "<u2")]
_FMT_FIELDS[3] = _FMT_FIELDS[1] + [("Red", "<u2"), ("Green", "<u2"), ("Blue", "<u2")]
_FMT_FIELDS[6] = _FMT_FIELDS[6] + [("GpsTime", "<f8")]  # fmt 6 always has time
_FMT_FIELDS[7] = _FMT_FIELDS[6] + [("Red", "<u2"), ("Green", "<u2"), ("Blue", "<u2")]
_FMT_FIELDS[8] = _FMT_FIELDS[7] + [("Infrared", "<u2")]

_STANDARD_SIZES = {0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36, 8: 38}

# Extra-bytes VLR data_type codes (LAS 1.4 spec table 24).
_EXTRA_TYPE_TO_NP = {
    1: np.dtype("u1"),
    2: np.dtype("i1"),
    3: np.dtype("<u2"),
    4: np.dtype("<i2"),
    5: np.dtype("<u4"),
    6: np.dtype("<i4"),
    7: np.dtype("<u8"),
    8: np.dtype("<i8"),
    9: np.dtype("<f4"),
    10: np.dtype("<f8"),
}
_NP_TO_EXTRA_TYPE = {v.str.lstrip("<>|="): k for k, v in _EXTRA_TYPE_TO_NP.items()}


@dataclasses.dataclass
class LasVLR:
    user_id: str
    record_id: int
    description: str
    data: bytes

    def packed(self) -> bytes:
        head = struct.pack(
            "<H16sHH32s",
            0,
            self.user_id.encode("ascii", "replace")[:16].ljust(16, b"\0"),
            self.record_id,
            len(self.data),
            self.description.encode("ascii", "replace")[:32].ljust(32, b"\0"),
        )
        return head + self.data


@dataclasses.dataclass
class ExtraDim:
    name: str
    dtype: np.dtype

    def descriptor(self) -> bytes:
        code = _NP_TO_EXTRA_TYPE.get(np.dtype(self.dtype).str.lstrip("<>|="))
        if code is None:
            raise ValueError(f"Unsupported extra-dim dtype {self.dtype} for '{self.name}'")
        buf = bytearray(192)
        buf[2] = code
        name_b = self.name.encode("ascii", "replace")[:32]
        buf[4 : 4 + len(name_b)] = name_b
        return bytes(buf)

    @staticmethod
    def parse_vlr(data: bytes) -> List["ExtraDim"]:
        dims = []
        for off in range(0, len(data) - 191, 192):
            rec = data[off : off + 192]
            code = rec[2]
            name = rec[4:36].split(b"\0")[0].decode("ascii", "replace")
            if code == 0:
                # undocumented bytes: options byte holds the size
                size = rec[3]
                dims.append(ExtraDim(name or f"extra_{off//192}", np.dtype(f"V{max(size,1)}")))
                continue
            np_t = _EXTRA_TYPE_TO_NP.get(code)
            if np_t is None:
                raise ValueError(f"Extra-bytes data_type {code} not supported (dim '{name}')")
            dims.append(ExtraDim(name, np_t))
        return dims


@dataclasses.dataclass
class LasHeader:
    version: Tuple[int, int] = (1, 2)
    point_format: int = 3
    point_count: int = 0
    scales: Tuple[float, float, float] = (0.01, 0.01, 0.01)
    offsets: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    mins: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    maxs: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    point_record_length: int = 0
    vlrs: List[LasVLR] = dataclasses.field(default_factory=list)
    extra_dims: List[ExtraDim] = dataclasses.field(default_factory=list)
    global_encoding: int = 0
    file_source_id: int = 0
    system_identifier: str = "myria3d_tpu"
    generating_software: str = "myria3d_tpu LAS writer"
    creation_doy: int = 1
    creation_year: int = 2026

    @property
    def standard_record_length(self) -> int:
        return _STANDARD_SIZES[self.point_format]


@dataclasses.dataclass
class LasData:
    header: LasHeader
    points: np.ndarray  # structured array with PDAL-style dimension names

    def __len__(self) -> int:
        return len(self.points)


def _is_laz(path: str, point_format_byte: int, vlrs: Sequence[LasVLR]) -> bool:
    if path.lower().endswith(".laz"):
        return True
    if point_format_byte & 0x80:
        return True
    return any(v.user_id.startswith("laszip") for v in vlrs)


_LASZIP_USER_ID = "laszip encoded"
_LASZIP_RECORD_ID = 22204
# LAZ write chunking: points per chunk, or -1 for variable-size chunks
# (the chunk table then carries per-chunk point counts, laszip-style)
LAZ_CHUNK_SIZE = 50000
# laszip VLR item types (spec): BYTE=0, POINT10=6, GPSTIME11=7, RGB12=8,
# POINT14=10, RGB14=11, RGBNIR14=12, BYTE14=14
_LAZ_ITEMS_BY_FORMAT = {
    0: [(6, 20)],
    1: [(6, 20), (7, 8)],
    2: [(6, 20), (8, 6)],
    3: [(6, 20), (7, 8), (8, 6)],
    # LAS 1.4 layered formats (compressor 3, item version 3)
    6: [(10, 30)],
    7: [(10, 30), (11, 6)],
    8: [(10, 30), (12, 8)],
}
_LAYERED_FORMATS = (6, 7, 8)


def _parse_laszip_vlr(vlrs: Sequence[LasVLR]) -> Optional[dict]:
    """Decode the 'laszip encoded' VLR (record 22204): compressor, chunk
    size and the item list that define the compressed point stream."""
    for v in vlrs:
        if v.user_id == _LASZIP_USER_ID and v.record_id == _LASZIP_RECORD_ID:
            d = v.data
            if len(d) < 34:
                raise ValueError("laszip VLR too short")
            # spec layout: compressor u16 @0, coder u16 @2, version u8 @4 /
            # u8 @5 / u16 @6, options u32 @8, chunk_size u32 @12,
            # special-EVLR i64 pair @16/@24, num_items u16 @32
            compressor, coder = struct.unpack_from("<HH", d, 0)
            version = (d[4], d[5], struct.unpack_from("<H", d, 6)[0])
            chunk_size, = struct.unpack_from("<i", d, 12)
            num_items, = struct.unpack_from("<H", d, 32)
            items = []
            for k in range(num_items):
                t, s, ver = struct.unpack_from("<HHH", d, 34 + 6 * k)
                items.append((t, s, ver))
            return {
                "compressor": compressor,
                "coder": coder,
                "version": version,
                "chunk_size": chunk_size,
                "items": items,
            }
    return None


def _make_laszip_vlr(point_format: int, extra_len: int, chunk_size: int) -> LasVLR:
    """laszip VLR: pointwise-chunked compressor 2 / item version 2 for the
    classic formats 0-3, layered compressor 3 / item version 3 for the
    LAS 1.4 formats 6-8."""
    layered = point_format in _LAYERED_FORMATS
    items = list(_LAZ_ITEMS_BY_FORMAT[point_format])
    if extra_len > 0:
        items.append((14 if layered else 0, extra_len))
    d = bytearray(34 + 6 * len(items))
    struct.pack_into("<HH", d, 0, 3 if layered else 2, 0)  # compressor, coder
    d[4], d[5] = (3, 4) if layered else (2, 2)             # laszip version
    struct.pack_into("<H", d, 6, 0)               # revision
    struct.pack_into("<I", d, 8, 0)               # options
    struct.pack_into("<i", d, 12, chunk_size)
    struct.pack_into("<qq", d, 16, -1, -1)        # no special EVLRs
    struct.pack_into("<H", d, 32, len(items))
    for k, (t, s) in enumerate(items):
        struct.pack_into("<HHH", d, 34 + 6 * k, t, s, 3 if layered else 2)
    return LasVLR(_LASZIP_USER_ID, _LASZIP_RECORD_ID, "by myria3d_tpu", bytes(d))


def read_las_header(path: str) -> LasHeader:
    """Parse the LAS header + VLRs without reading point data.

    Equivalent of the reference's `pdal info --metadata` subprocess call
    (reference ``myria3d/pctl/dataset/utils.py:105-120``) used to get the
    point count cheaply at interpolation time."""
    with open(path, "rb") as f:
        raw = f.read(375 + 1)
    if raw[:4] != b"LASF":
        raise ValueError(f"{path} is not a LAS file (bad magic {raw[:4]!r})")
    file_source_id, global_encoding = struct.unpack_from("<HH", raw, 4)
    major, minor = raw[24], raw[25]
    system_identifier = raw[26:58].split(b"\0")[0].decode("ascii", "replace")
    generating_software = raw[58:90].split(b"\0")[0].decode("ascii", "replace")
    creation_doy, creation_year = struct.unpack_from("<HH", raw, 90)
    header_size, = struct.unpack_from("<H", raw, 94)
    point_offset, = struct.unpack_from("<I", raw, 96)
    n_vlrs, = struct.unpack_from("<I", raw, 100)
    point_format_byte = raw[104]
    point_format = point_format_byte & 0x3F
    point_record_length, = struct.unpack_from("<H", raw, 105)
    legacy_count, = struct.unpack_from("<I", raw, 107)
    scales = struct.unpack_from("<3d", raw, 131)
    offsets = struct.unpack_from("<3d", raw, 155)
    maxx, minx, maxy, miny, maxz, minz = struct.unpack_from("<6d", raw, 179)
    point_count = legacy_count
    if (major, minor) >= (1, 4):
        count_14, = struct.unpack_from("<Q", raw, 247)
        if count_14:
            point_count = count_14

    vlrs: List[LasVLR] = []
    with open(path, "rb") as f:
        f.seek(header_size)
        for _ in range(n_vlrs):
            head = f.read(54)
            if len(head) < 54:
                break
            _, user_id_b, record_id, rec_len, desc_b = struct.unpack("<H16sHH32s", head)
            data = f.read(rec_len)
            vlrs.append(
                LasVLR(
                    user_id_b.split(b"\0")[0].decode("ascii", "replace"),
                    record_id,
                    desc_b.split(b"\0")[0].decode("ascii", "replace"),
                    data,
                )
            )

    if point_format not in _STANDARD_SIZES:
        raise ValueError(f"Unsupported LAS point format {point_format}")

    extra_dims: List[ExtraDim] = []
    extra_len = point_record_length - _STANDARD_SIZES[point_format]
    if extra_len > 0:
        for v in vlrs:
            if v.user_id == "LASF_Spec" and v.record_id == 4:
                extra_dims = ExtraDim.parse_vlr(v.data)
        described = sum(d.dtype.itemsize for d in extra_dims)
        if described < extra_len:
            extra_dims.append(ExtraDim("undocumented_extra", np.dtype(f"V{extra_len - described}")))

    header = LasHeader(
        version=(major, minor),
        point_format=point_format,
        point_count=point_count,
        scales=scales,
        offsets=offsets,
        mins=(minx, miny, minz),
        maxs=(maxx, maxy, maxz),
        point_record_length=point_record_length,
        vlrs=vlrs,
        extra_dims=extra_dims,
        global_encoding=global_encoding,
        file_source_id=file_source_id,
        system_identifier=system_identifier,
        generating_software=generating_software,
        creation_doy=creation_doy,
        creation_year=creation_year,
    )
    header._point_offset = point_offset  # type: ignore[attr-defined]
    header._is_laz = _is_laz(path, point_format_byte, vlrs)  # type: ignore[attr-defined]
    return header


def _packed_dtype(header: LasHeader) -> np.dtype:
    fields = list(_FMT_FIELDS[header.point_format])
    for d in header.extra_dims:
        fields.append((d.name, d.dtype.str))
    dt = np.dtype(fields)
    if dt.itemsize != header.point_record_length:
        # pad with raw bytes if record longer than the described fields
        pad = header.point_record_length - dt.itemsize
        if pad < 0:
            raise ValueError(
                f"Point record length {header.point_record_length} smaller than "
                f"described layout ({dt.itemsize})"
            )
        fields.append(("_pad", f"V{pad}"))
        dt = np.dtype(fields)
    return dt


def read_las(path: str) -> LasData:
    """Read a LAS file into a PDAL-style named numpy array.

    X/Y/Z are returned scaled+offset as float64 (like PDAL). Bit-packed
    fields are unpacked into ReturnNumber / NumberOfReturns /
    ScanDirectionFlag / EdgeOfFlightLine / Classification columns.
    """
    header = read_las_header(path)
    dt = _packed_dtype(header)

    out_fields: List[Tuple[str, str]] = [("X", "<f8"), ("Y", "<f8"), ("Z", "<f8")]
    old_classification = header.point_format < 6
    for name, typ in dt.descr:  # type: ignore[union-attr]
        if name in ("X_raw", "Y_raw", "Z_raw", "flags", "returns", "raw_classification", "_pad"):
            continue
        out_fields.append((name, typ))
    out_fields.insert(3 + 1, ("ReturnNumber", "u1"))
    out_fields.insert(3 + 2, ("NumberOfReturns", "u1"))
    out_fields.insert(3 + 3, ("ScanDirectionFlag", "u1"))
    out_fields.insert(3 + 4, ("EdgeOfFlightLine", "u1"))
    if old_classification:
        out_fields.insert(3 + 5, ("Classification", "u1"))

    native_pts = _read_unpacked_native(path, header, dt, np.dtype(out_fields))
    if native_pts is not None:
        return LasData(header=header, points=native_pts)
    if getattr(header, "_is_laz", False):
        raw = _read_laz_points(path, header, dt)
    else:
        with open(path, "rb") as f:
            f.seek(header._point_offset)  # type: ignore[attr-defined]
            raw = np.fromfile(f, dtype=dt, count=header.point_count)

    out = np.empty(len(raw), dtype=np.dtype(out_fields))
    sx, sy, sz = header.scales
    ox, oy, oz = header.offsets
    out["X"] = raw["X_raw"] * sx + ox
    out["Y"] = raw["Y_raw"] * sy + oy
    out["Z"] = raw["Z_raw"] * sz + oz
    if header.point_format < 6:
        out["ReturnNumber"] = raw["flags"] & 0x07
        out["NumberOfReturns"] = (raw["flags"] >> 3) & 0x07
        out["ScanDirectionFlag"] = (raw["flags"] >> 6) & 0x01
        out["EdgeOfFlightLine"] = (raw["flags"] >> 7) & 0x01
        out["Classification"] = raw["raw_classification"] & 0x1F
    else:
        out["ReturnNumber"] = raw["returns"] & 0x0F
        out["NumberOfReturns"] = (raw["returns"] >> 4) & 0x0F
        out["ScanDirectionFlag"] = (raw["flags"] >> 6) & 0x01
        out["EdgeOfFlightLine"] = (raw["flags"] >> 7) & 0x01
        out["Classification"] = raw["Classification"]
    for name in out.dtype.names:
        if name in (
            "X", "Y", "Z", "ReturnNumber", "NumberOfReturns",
            "ScanDirectionFlag", "EdgeOfFlightLine", "Classification",
        ):
            continue
        if name in (raw.dtype.names or ()):
            out[name] = raw[name]
    return LasData(header=header, points=out)


def _read_laz_points(path: str, header: LasHeader, dt: np.dtype) -> np.ndarray:
    """Decompress the LAZ point block into a raw record array via the native
    LASzip codec (``pctl/native/laszip_native.cpp``). Supports compressor 1
    (pointwise) and 2 (pointwise chunked) with item version 2 — the classic
    LAS 1.2/1.3 point formats 0–3 (+extra bytes)."""
    out = _read_laz_record_bytes(path, header, dt)
    if out is None:
        raise RuntimeError(
            f"{path}: LAZ input needs the native codec, which failed to build"
        )
    return np.frombuffer(out.tobytes(), dtype=dt)


def _read_laz_record_bytes(
    path: str, header: LasHeader, dt: np.dtype
) -> Optional[np.ndarray]:
    """LAZ point block -> flat uint8 record bytes (``None`` = codec absent)."""
    from myria3d_tpu.pctl.native import laz_decompress_points

    laszip = _parse_laszip_vlr(header.vlrs)
    if laszip is None:
        raise ValueError(f"{path}: LAZ flagged but no laszip VLR found")
    layered = laszip["compressor"] == 3
    if laszip["compressor"] not in (1, 2, 3):
        raise NotImplementedError(
            f"{path}: unsupported LAZ compressor {laszip['compressor']}"
        )
    want_ver = 3 if layered else 2
    items = []
    for t, s, ver in laszip["items"]:
        if ver != want_ver:
            raise NotImplementedError(
                f"{path}: LAZ item type {t} version {ver} not supported "
                f"(expected item version {want_ver} for "
                f"compressor {laszip['compressor']})"
            )
        items.append((t, s))
    point_size = sum(s for _, s in items)
    if point_size != dt.itemsize:
        raise ValueError(
            f"{path}: laszip items total {point_size} B but point record "
            f"is {dt.itemsize} B"
        )
    with open(path, "rb") as f:
        file_bytes = f.read()
    chunk_size = laszip["chunk_size"] if laszip["compressor"] in (2, 3) else 0
    return laz_decompress_points(
        file_bytes,
        header._point_offset,  # type: ignore[attr-defined]
        header.point_count,
        chunk_size,
        items,
        layered=layered,
    )


def _native_unpack_table(header: LasHeader, dt: np.dtype, out_dtype: np.dtype):
    """Field table driving ``pctl_native.las_unpack_records`` — one
    (src_off, src_type, shift, mask, scale, offset, dst_off, dst_type) row
    per output column, mirroring ``_unpack_bitfields`` + the XYZ
    grid-descale exactly. Returns None when some column can't be expressed
    (→ numpy fallback)."""
    from myria3d_tpu.pctl.native import NATIVE_TYPE_ENUM

    fields = []
    rn_src = "flags" if header.point_format < 6 else "returns"
    sx, sy, sz = header.scales
    ox, oy, oz = header.offsets
    assert dt.fields is not None and out_dtype.fields is not None
    for name in out_dtype.names or ():
        ddt, dst_off = out_dtype.fields[name][:2]
        dcode = NATIVE_TYPE_ENUM.get(ddt.str.lstrip("<=|"))
        if dcode is None:
            return None
        if name in ("X", "Y", "Z"):
            src, scale, off = {
                "X": ("X_raw", sx, ox),
                "Y": ("Y_raw", sy, oy),
                "Z": ("Z_raw", sz, oz),
            }[name]
            if scale == 0.0:
                return None  # degenerate header; keep the generic path
            fields.append((dt.fields[src][1], 5, 0, 0, scale, off,
                           dst_off, dcode))
        elif name == "ReturnNumber":
            m = 0x07 if header.point_format < 6 else 0x0F
            fields.append((dt.fields[rn_src][1], 0, 0, m, 0.0, 0.0,
                           dst_off, dcode))
        elif name == "NumberOfReturns":
            sh, m = (3, 0x07) if header.point_format < 6 else (4, 0x0F)
            fields.append((dt.fields[rn_src][1], 0, sh, m, 0.0, 0.0,
                           dst_off, dcode))
        elif name == "ScanDirectionFlag":
            fields.append((dt.fields["flags"][1], 0, 6, 0x01, 0.0, 0.0,
                           dst_off, dcode))
        elif name == "EdgeOfFlightLine":
            fields.append((dt.fields["flags"][1], 0, 7, 0x01, 0.0, 0.0,
                           dst_off, dcode))
        elif name == "Classification" and header.point_format < 6:
            fields.append((dt.fields["raw_classification"][1], 0, 0, 0x1F,
                           0.0, 0.0, dst_off, dcode))
        else:
            if name not in dt.fields:
                return None
            fdt, foff = dt.fields[name][:2]
            code = NATIVE_TYPE_ENUM.get(fdt.str.lstrip("<=|"))
            if code is None:
                return None
            fields.append((foff, code, 0, 0, 0.0, 0.0, dst_off, dcode))
    return fields


def _read_unpacked_native(
    path: str, header: LasHeader, dt: np.dtype, out_dtype: np.dtype
) -> Optional[np.ndarray]:
    """Fused native record->columns conversion (single pass, threaded).
    Returns the structured points array, or None to fall back to numpy."""
    from myria3d_tpu.pctl.native import native_las_unpack_records

    table = _native_unpack_table(header, dt, out_dtype)
    if table is None:
        return None
    n = header.point_count
    if getattr(header, "_is_laz", False):
        rec_bytes = _read_laz_record_bytes(path, header, dt)
        if rec_bytes is None:
            return None
    else:
        mm = np.memmap(path, np.uint8, mode="r")
        start = header._point_offset  # type: ignore[attr-defined]
        if start + n * dt.itemsize > mm.size:
            return None  # truncated file: let the generic reader error out
        rec_bytes = mm[start:]
    return native_las_unpack_records(rec_bytes, n, dt.itemsize, table, out_dtype)


def read_las_float32(path: str) -> LasData:
    """Read with every output column float32, in ONE cast pass.

    The training/inference data layer consumes float32 everywhere
    (reference ``pdal_read_las_array_as_float32``); going through the
    generic f64 named array first would copy the whole tile twice. This
    builds the f32 array straight from the packed records — via the fused
    thread-parallel C++ record walk (``pctl_native.las_records_to_f32``)
    when available, else numpy per-field strided copies (same semantics).
    """
    header = read_las_header(path)
    dt = _packed_dtype(header)
    names = _output_field_order(header, dt)
    f32_dtype = np.dtype([(n, "<f4") for n in names])
    native_pts = _read_unpacked_native(path, header, dt, f32_dtype)
    if native_pts is not None:
        return LasData(header=header, points=native_pts)
    if getattr(header, "_is_laz", False):
        raw = _read_laz_points(path, header, dt)
    else:
        with open(path, "rb") as f:
            f.seek(header._point_offset)  # type: ignore[attr-defined]
            raw = np.fromfile(f, dtype=dt, count=header.point_count)

    out = np.empty(len(raw), dtype=f32_dtype)
    sx, sy, sz = header.scales
    ox, oy, oz = header.offsets
    # scale in f64 (raw i32 magnitudes exceed f32's integer range), cast once
    out["X"] = raw["X_raw"] * sx + ox
    out["Y"] = raw["Y_raw"] * sy + oy
    out["Z"] = raw["Z_raw"] * sz + oz
    _unpack_bitfields(header, raw, out)
    for name in names:
        if name in (raw.dtype.names or ()) and name not in (
            "X", "Y", "Z", "Classification",
        ):
            out[name] = raw[name]
    return LasData(header=header, points=out)


def _output_field_order(header: LasHeader, dt: np.dtype) -> List[str]:
    """Same column order as ``read_las`` so both readers are
    drop-in-interchangeable for by-name AND by-position consumers."""
    names = ["X", "Y", "Z"]
    for name in dt.names or ():
        if name in ("X_raw", "Y_raw", "Z_raw", "flags", "returns",
                    "raw_classification", "_pad"):
            continue
        if np.dtype(dt[name]).kind == "V":
            continue
        names.append(name)
    names.insert(4, "ReturnNumber")
    names.insert(5, "NumberOfReturns")
    names.insert(6, "ScanDirectionFlag")
    names.insert(7, "EdgeOfFlightLine")
    if header.point_format < 6:
        names.insert(8, "Classification")
    return names


def _unpack_bitfields(header: LasHeader, raw: np.ndarray, out: np.ndarray) -> None:
    if header.point_format < 6:
        out["ReturnNumber"] = raw["flags"] & 0x07
        out["NumberOfReturns"] = (raw["flags"] >> 3) & 0x07
        out["ScanDirectionFlag"] = (raw["flags"] >> 6) & 0x01
        out["EdgeOfFlightLine"] = (raw["flags"] >> 7) & 0x01
        out["Classification"] = raw["raw_classification"] & 0x1F
    else:
        out["ReturnNumber"] = raw["returns"] & 0x0F
        out["NumberOfReturns"] = (raw["returns"] >> 4) & 0x0F
        out["ScanDirectionFlag"] = (raw["flags"] >> 6) & 0x01
        out["EdgeOfFlightLine"] = (raw["flags"] >> 7) & 0x01
        out["Classification"] = raw["Classification"]


def _native_pack_table(
    points: np.ndarray,
    extra_sources: Dict[str, np.ndarray],
    header: LasHeader,
    dt: np.dtype,
):
    """Field table driving ``pctl_native.las_pack_records`` — the write-side
    mirror of ``_native_unpack_table``, reproducing ``write_las``'s numpy
    column assignments exactly (bitfield packing, XYZ grid scaling with
    round-half-to-even, missing-column defaults). Returns (fields, keep)
    or None when some column can't be expressed (→ numpy fallback)."""
    from myria3d_tpu.pctl.native import NATIVE_TYPE_ENUM

    fmt = header.point_format
    names = points.dtype.names or ()
    if len(points) == 0:
        return None  # nothing to pack; the numpy path handles empty clouds
    keep: List[np.ndarray] = []  # holds const/contiguous temporaries alive
    fields = []
    assert dt.fields is not None

    def src_of(name: str, default: int = 0):
        if name in names:
            v = points[name]
            code = NATIVE_TYPE_ENUM.get(v.dtype.str.lstrip("<=|"))
            if code is None:
                return None
            return (v, v.strides[0], code)
        cst = np.full(1, default, np.int64)
        keep.append(cst)
        return (cst, 0, 7)

    def add(src, dname: str, shift: int = 0, mask: int = 0,
            scale: float = 0.0, offset: float = 0.0) -> bool:
        if src is None:
            return False
        ddt, doff = dt.fields[dname][:2]
        dcode = NATIVE_TYPE_ENUM.get(ddt.str.lstrip("<=|"))
        if dcode is None:
            return False
        fields.append((src[0], src[1], src[2], shift, mask,
                       scale, offset, doff, dcode))
        return True

    sx, sy, sz = header.scales
    ox, oy, oz = header.offsets
    for axis, s, o in (("X", sx, ox), ("Y", sy, oy), ("Z", sz, oz)):
        src = src_of(axis)
        # the numpy path computes (coord - offset) / scale at the COLUMN's
        # own precision; the kernel computes in f64 — only equivalent for
        # f8 sources, so anything else keeps the generic path
        if src is None or src[2] != 9 or s == 0.0:
            return None
        if not add(src, axis + "_raw", scale=s, offset=o):
            return None
    ok = add(src_of("Intensity"), "Intensity")
    rn, nr = src_of("ReturnNumber", 1), src_of("NumberOfReturns", 1)
    sd, eo = src_of("ScanDirectionFlag"), src_of("EdgeOfFlightLine")
    cls = src_of("Classification")
    if any(s is None or s[2] >= 8 for s in (rn, nr, sd, eo, cls)):
        return None  # float-typed flag columns: keep the generic path
    if fmt < 6:
        ok &= add(rn, "flags", shift=0, mask=0x07)
        ok &= add(nr, "flags", shift=3, mask=0x07)
        ok &= add(sd, "flags", shift=6, mask=0x01)
        ok &= add(eo, "flags", shift=7, mask=0x01)
        ok &= add(cls, "raw_classification", shift=0, mask=0x1F)
        ok &= add(src_of("ScanAngleRank"), "ScanAngleRank")
    else:
        ok &= add(rn, "returns", shift=0, mask=0x0F)
        ok &= add(nr, "returns", shift=4, mask=0x0F)
        ok &= add(sd, "flags", shift=6, mask=0x01)
        ok &= add(eo, "flags", shift=7, mask=0x01)
        ok &= add(cls, "Classification")
        ok &= add(src_of("ScanAngle"), "ScanAngle")
    ok &= add(src_of("UserData"), "UserData")
    ok &= add(src_of("PointSourceId"), "PointSourceId")
    for name, _ in _FMT_FIELDS[fmt]:
        if name in ("GpsTime", "Red", "Green", "Blue", "Infrared") and name in names:
            ok &= add(src_of(name), name)
    for name, values in extra_sources.items():
        v = np.asarray(values)  # strided views pack directly (no copy)
        if v.ndim != 1:
            return None
        keep.append(v)
        code = NATIVE_TYPE_ENUM.get(v.dtype.str.lstrip("<=|"))
        if code is None:
            return None
        ok &= add((v, v.strides[0], code), name)
    if not ok:
        return None
    return fields, keep


def write_las(
    path: str,
    points: np.ndarray,
    header: Optional[LasHeader] = None,
    extra_dims: str = "all",
    extra_columns: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Write a PDAL-style named array to a LAS file.

    Args:
        points: structured array with at least X/Y/Z; PDAL-style names.
        header: template header (typically from the source LAS) — its version,
            point format, scales, offsets and VLRs (CRS!) are preserved,
            reproducing PDAL's writer-params-from-reader-metadata behaviour
            (reference ``myria3d/models/interpolation.py:88-91``).
        extra_dims: "all" writes any non-standard fields as extra-bytes dims.
        extra_columns: additional extra-bytes dims as plain arrays (len ==
            len(points)), written after the points' own non-standard fields
            in insertion order. A name colliding with a points field
            overrides it — the column wins. Lets callers add derived
            channels (probas/classes/entropy) without first building a
            widened record array (one less full-tile strided copy).
    """
    if header is None:
        header = LasHeader()
    fmt = header.point_format
    std_names = {n for n, _ in _FMT_FIELDS[fmt]} | {
        "X", "Y", "Z", "ReturnNumber", "NumberOfReturns",
        "ScanDirectionFlag", "EdgeOfFlightLine", "Classification",
    }
    std_names -= {"X_raw", "Y_raw", "Z_raw", "flags", "returns", "raw_classification"}

    extra_columns = extra_columns or {}
    new_extra: List[ExtraDim] = []
    if extra_dims == "all":
        for name in points.dtype.names or ():
            if name not in std_names and name not in extra_columns:
                d = points.dtype[name]
                if d.kind == "V":
                    continue
                new_extra.append(ExtraDim(name, d))
    for name, values in extra_columns.items():
        values = np.asarray(values)
        if len(values) != len(points):
            raise ValueError(
                f"extra column {name!r} has {len(values)} values for "
                f"{len(points)} points"
            )
        new_extra.append(ExtraDim(name, values.dtype))

    fields = list(_FMT_FIELDS[fmt]) + [(d.name, d.dtype.str) for d in new_extra]
    dt = np.dtype(fields)

    n = len(points)

    def col(name: str, default: int = 0) -> np.ndarray:
        if name in (points.dtype.names or ()):
            return points[name]
        return np.full(n, default)

    rn = np.asarray(col("ReturnNumber", 1)).astype(np.uint8)  # by_return too

    extra_sources = {
        d.name: (extra_columns[d.name] if d.name in extra_columns
                 else points[d.name])
        for d in new_extra
    }
    raw = None
    table = _native_pack_table(points, extra_sources, header, dt)
    if table is not None:
        from myria3d_tpu.pctl.native import native_las_pack_records

        fields_tbl, _keep = table
        raw = native_las_pack_records(fields_tbl, n, dt)
    if raw is None:  # generic numpy path (no toolchain / exotic dtypes)
        raw = np.zeros(n, dtype=dt)
        sx, sy, sz = header.scales
        ox, oy, oz = header.offsets
        raw["X_raw"] = np.round((points["X"] - ox) / sx).astype(np.int64)
        raw["Y_raw"] = np.round((points["Y"] - oy) / sy).astype(np.int64)
        raw["Z_raw"] = np.round((points["Z"] - oz) / sz).astype(np.int64)

        raw["Intensity"] = col("Intensity")
        nr = np.asarray(col("NumberOfReturns", 1)).astype(np.uint8)
        sd = np.asarray(col("ScanDirectionFlag")).astype(np.uint8)
        eo = np.asarray(col("EdgeOfFlightLine")).astype(np.uint8)
        cls = np.asarray(col("Classification")).astype(np.uint8)
        if fmt < 6:
            raw["flags"] = (rn & 0x07) | ((nr & 0x07) << 3) | ((sd & 1) << 6) | ((eo & 1) << 7)
            raw["raw_classification"] = cls & 0x1F
            raw["ScanAngleRank"] = np.asarray(col("ScanAngleRank")).astype(np.int8)
        else:
            raw["returns"] = (rn & 0x0F) | ((nr & 0x0F) << 4)
            raw["flags"] = ((sd & 1) << 6) | ((eo & 1) << 7)
            raw["Classification"] = cls
            raw["ScanAngle"] = np.asarray(col("ScanAngle")).astype(np.int16)
        raw["UserData"] = col("UserData")
        raw["PointSourceId"] = col("PointSourceId")
        for name, _ in _FMT_FIELDS[fmt]:
            if name in ("GpsTime", "Red", "Green", "Blue", "Infrared") and name in (
                points.dtype.names or ()
            ):
                raw[name] = points[name]
        for d in new_extra:
            if d.name in extra_columns:
                raw[d.name] = np.asarray(extra_columns[d.name]).astype(d.dtype)
            else:
                raw[d.name] = points[d.name].astype(d.dtype)

    # VLRs: carry over source VLRs, replacing any existing extra-bytes VLR
    # with one describing the dims actually written, and dropping any stale
    # laszip VLR (re-added below when actually writing LAZ).
    vlrs = [
        v for v in header.vlrs
        if not (v.user_id == "LASF_Spec" and v.record_id == 4)
        and v.user_id != _LASZIP_USER_ID
    ]
    if new_extra:
        vlrs.append(
            LasVLR(
                "LASF_Spec", 4, "Extra Bytes Records",
                b"".join(d.descriptor() for d in new_extra),
            )
        )

    as_laz = path.lower().endswith(".laz")
    # -1 (VLR U32_MAX) selects variable-size chunking — mainly a test hook
    # for the reader's variable chunk-table path; production stays at the
    # laszip default of 50000-point chunks.
    laz_chunk_size = LAZ_CHUNK_SIZE
    if as_laz:
        if fmt not in _LAZ_ITEMS_BY_FORMAT:
            raise NotImplementedError(
                f"LAZ write supports point formats 0-3 and 6-8 (got {fmt})"
            )
        extra_len = dt.itemsize - _STANDARD_SIZES[fmt]
        vlrs.append(_make_laszip_vlr(fmt, extra_len, laz_chunk_size))

    major, minor = header.version
    if (major, minor) not in _HEADER_SIZES:
        major, minor = (1, 4) if fmt >= 6 else (1, 2)
    if fmt >= 6 and (major, minor) < (1, 4):
        major, minor = 1, 4
    header_size = _HEADER_SIZES[(major, minor)]
    vlr_bytes = b"".join(v.packed() for v in vlrs)
    point_offset = header_size + len(vlr_bytes)

    if n:
        mins = (points["X"].min(), points["Y"].min(), points["Z"].min())
        maxs = (points["X"].max(), points["Y"].max(), points["Z"].max())
    else:
        mins = maxs = (0.0, 0.0, 0.0)

    by_return = np.zeros(15, dtype=np.uint64)
    if n:
        rn_clip = np.clip(rn, 1, 15)
        counts = np.bincount(rn_clip, minlength=16)[1:16]
        by_return[: len(counts)] = counts

    legacy_count = n if (n < 2**32 and fmt < 6) else (n if (major, minor) < (1, 4) else (n if n < 2**32 else 0))

    laz_blob: Optional[bytes] = None
    if as_laz:
        from myria3d_tpu.pctl.native import laz_compress_points

        layered = fmt in _LAYERED_FORMATS
        items = list(_LAZ_ITEMS_BY_FORMAT[fmt])
        extra_len = dt.itemsize - _STANDARD_SIZES[fmt]
        if extra_len > 0:
            items.append((14 if layered else 0, extra_len))
        laz_blob = laz_compress_points(
            raw, n, point_offset, laz_chunk_size, items, layered=layered
        )
        if laz_blob is None:
            raise RuntimeError(
                "LAZ output needs the native codec, which failed to build"
            )

    buf = bytearray(header_size)
    struct.pack_into("<4s", buf, 0, b"LASF")
    struct.pack_into("<HH", buf, 4, header.file_source_id, header.global_encoding)
    buf[24] = major
    buf[25] = minor
    buf[26:58] = header.system_identifier.encode("ascii", "replace")[:32].ljust(32, b"\0")
    buf[58:90] = header.generating_software.encode("ascii", "replace")[:32].ljust(32, b"\0")
    struct.pack_into("<HH", buf, 90, header.creation_doy, header.creation_year)
    struct.pack_into("<H", buf, 94, header_size)
    struct.pack_into("<I", buf, 96, point_offset)
    struct.pack_into("<I", buf, 100, len(vlrs))
    buf[104] = fmt | (0x80 if as_laz else 0)
    struct.pack_into("<H", buf, 105, dt.itemsize)
    struct.pack_into("<I", buf, 107, legacy_count if legacy_count < 2**32 else 0)
    legacy_by_return = by_return[:5].astype(np.uint32)
    struct.pack_into("<5I", buf, 111, *legacy_by_return.tolist())
    struct.pack_into("<3d", buf, 131, *header.scales)
    struct.pack_into("<3d", buf, 155, *header.offsets)
    struct.pack_into(
        "<6d", buf, 179, maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2]
    )
    if (major, minor) >= (1, 3):
        struct.pack_into("<Q", buf, 227, 0)  # waveform start
    if (major, minor) >= (1, 4):
        struct.pack_into("<Q", buf, 235, 0)  # first EVLR
        struct.pack_into("<I", buf, 243, 0)  # n EVLRs
        struct.pack_into("<Q", buf, 247, n)
        struct.pack_into("<15Q", buf, 255, *by_return.tolist())

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(buf))
        f.write(vlr_bytes)
        if laz_blob is not None:
            f.write(laz_blob)
        else:
            raw.tofile(f)


# ---------------------------------------------------------------------------
# SRS helpers
# ---------------------------------------------------------------------------

def has_srs(header: LasHeader) -> bool:
    """True when the file carries CRS info (WKT VLR 2112 or GeoTIFF keys 34735)."""
    return any(
        (v.user_id == "LASF_Projection" and v.record_id in (2111, 2112, 34735))
        for v in header.vlrs
    )


def get_epsg_from_vlrs(header: LasHeader) -> Optional[int]:
    """Best-effort EPSG extraction from a WKT VLR (AUTHORITY[\"EPSG\",\"xxxx\"])."""
    for v in header.vlrs:
        if v.user_id == "LASF_Projection" and v.record_id == 2112:
            text = v.data.decode("ascii", "replace")
            import re

            codes = re.findall(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]', text)
            if codes:
                return int(codes[-1])
    return None


def make_wkt_vlr_for_epsg(epsg: int) -> LasVLR:
    """Minimal WKT VLR recording a forced EPSG (PDAL `override_srs` analog,
    reference ``myria3d/pctl/dataset/utils.py:86-93``)."""
    wkt = f'PROJCS["EPSG:{epsg}",AUTHORITY["EPSG","{epsg}"]]'
    return LasVLR("LASF_Projection", 2112, "OGC WKT (myria3d_tpu)", wkt.encode("ascii") + b"\0")
