"""Tiling and LAS utilities for the host data layer.

Reimplements the reference's ``myria3d/pctl/dataset/utils.py`` semantics on
top of the self-contained LAS reader: mosaic of subtile centers (``:29-38``),
LAS read as float32 named array (``:41-62``), EPSG forcing/fallback logic
(``:76-102``), square subtile extraction (``:126-158``), split-CSV parsing
(``:165-183``).

The reference's scipy cKDTree Chebyshev ball query is replaced by a
vectorized sort-based bucketing: subtile extraction is a square crop in XY,
which a lexicographic binning computes in O(N log N) once per tile instead of
one KD-tree query per subtile.
"""

from __future__ import annotations

import glob
import os
from numbers import Number
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from myria3d_tpu.pctl.io.las import (
    LasHeader,
    has_srs,
    make_wkt_vlr_for_epsg,
    read_las,
    read_las_header,
)

SPLIT_TYPE = str  # "train" | "val" | "test"
LAS_PATHS_BY_SPLIT_DICT_TYPE = Dict[str, List[str]]


def find_file_in_dir(data_dir: str, basename: str) -> str:
    """First file matching ``basename`` under ``data_dir`` (recursive)."""
    query = f"{data_dir}/**/{basename}"
    files = glob.glob(query, recursive=True)
    return files[0]


def get_mosaic_of_centers(
    tile_width: Number, subtile_width: Number, subtile_overlap: Number = 0
) -> List[np.ndarray]:
    """XY centers of the subtile mosaic covering a tile (reference ``utils.py:29-38``)."""
    if subtile_overlap < 0:
        raise ValueError("datamodule.subtile_overlap must be positive.")
    xy_range = np.arange(
        subtile_width / 2,
        tile_width + (subtile_width / 2) - subtile_overlap,
        step=subtile_width - subtile_overlap,
    )
    return [np.array([x, y]) for x in xy_range for y in xy_range]


def read_las_array(las_path: str, epsg: Optional[str]) -> Tuple[np.ndarray, LasHeader]:
    """Read LAS as a named array, enforcing the reference's EPSG contract:
    if ``epsg`` is falsy and the file has no SRS, raise (reference
    ``utils.py:76-102``). Returns (points, header)."""
    data = read_las(las_path)
    if epsg:
        # Force the CRS like PDAL's override_srs: replace projection VLRs.
        code = str(epsg).split(":")[-1]
        if code.isdigit():
            data.header.vlrs = [
                v for v in data.header.vlrs if v.user_id != "LASF_Projection"
            ] + [make_wkt_vlr_for_epsg(int(code))]
    elif not has_srs(data.header):
        raise RuntimeError(
            "No EPSG provided, neither in the lidar file or as parameter"
        )
    return data.points, data.header


def read_las_array_as_float32(
    las_path: str, epsg: Optional[str]
) -> Tuple[np.ndarray, LasHeader]:
    """Read LAS as a named array with every dimension cast to float32
    (reference ``utils.py:57-62``)."""
    arr, header = read_las_array(las_path, epsg)
    names = [n for n in arr.dtype.names if arr.dtype[n].kind != "V"]
    all_floats = np.dtype({"names": names, "formats": ["f4"] * len(names)})
    out = np.empty(arr.shape, dtype=all_floats)
    for n in names:
        out[n] = arr[n].astype(np.float32)
    return out, header


def get_las_metadata(las_path: str) -> Dict:
    """Header metadata (count, bounds, srs) — replaces the reference's
    `pdal info --metadata` subprocess (``utils.py:105-120``)."""
    h = read_las_header(las_path)
    return {
        "count": h.point_count,
        "minx": h.mins[0], "miny": h.mins[1], "minz": h.mins[2],
        "maxx": h.maxs[0], "maxy": h.maxs[1], "maxz": h.maxs[2],
        "point_format": h.point_format,
        "version": ".".join(map(str, h.version)),
        "srs": has_srs(h),
    }


def split_cloud_into_samples(
    las_path: str,
    tile_width: Number,
    subtile_width: Number,
    epsg: Optional[str],
    subtile_overlap: Number = 0,
    points: Optional[np.ndarray] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (idx_in_original_cloud, sample_points) square subtiles.

    Semantics of reference ``utils.py:126-158``: centers from
    ``get_mosaic_of_centers`` relative to the cloud's XY min; a subtile is all
    points within Chebyshev radius ``subtile_width // 2`` of a center; empty
    subtiles are skipped.
    """
    if points is None:
        points, _ = read_las_array_as_float32(las_path, epsg)
    xy = np.stack([points["X"], points["Y"]], axis=1).astype(np.float64)
    xy_rel = xy - xy.min(axis=0)

    radius = subtile_width // 2
    for center in get_mosaic_of_centers(tile_width, subtile_width, subtile_overlap):
        in_tile = (np.abs(xy_rel[:, 0] - center[0]) <= radius) & (
            np.abs(xy_rel[:, 1] - center[1]) <= radius
        )
        sample_idx = np.flatnonzero(in_tile)
        if not len(sample_idx):
            continue
        yield sample_idx, points[sample_idx]


def pre_filter_below_n_points(data, min_num_nodes: int = 1) -> bool:
    """True → filter the sample out (reference ``utils.py:161-162``)."""
    return data["pos"].shape[0] < min_num_nodes


def get_las_paths_by_split_dict(
    data_dir: str, split_csv_path: str
) -> LAS_PATHS_BY_SPLIT_DICT_TYPE:
    """Parse the split CSV (basename, split) into per-split LAS path lists
    (reference ``utils.py:165-183``)."""
    import pandas as pd

    las_paths_by_split_dict: LAS_PATHS_BY_SPLIT_DICT_TYPE = {}
    split_df = pd.read_csv(split_csv_path)
    for phase in ["train", "val", "test"]:
        basenames = split_df[split_df.split == phase].basename.tolist()
        # files may live anywhere under data_dir (reference find_file_in_dir)
        las_paths_by_split_dict[phase] = [
            find_file_in_dir(data_dir, b) for b in basenames
        ]
    if not any(las_paths_by_split_dict.values()):
        raise FileNotFoundError(
            f"No basename found while parsing directory {data_dir} "
            f"using {split_csv_path} as split CSV."
        )
    return las_paths_by_split_dict
