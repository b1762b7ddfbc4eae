"""Streaming inference dataset over a single LAS file.

Reimplements reference ``myria3d/pctl/dataset/iterable.py:16-76``: yields
transformed subtile samples from one LAS in an exhaustive mosaic, keeping
``idx_in_original_cloud`` per sample for final interpolation.
"""

from __future__ import annotations

from numbers import Number
from typing import Callable, Iterator, Optional

from myria3d_tpu.pctl.dataset.utils import (
    pre_filter_below_n_points,
    split_cloud_into_samples,
)
from myria3d_tpu.pctl.points_pre_transform.lidar_hd import lidar_hd_pre_transform


class InferenceDataset:
    """Iterable dataset to load subtile samples from a single LAS file."""

    def __init__(
        self,
        las_file: str,
        epsg: Optional[str],
        points_pre_transform: Callable = lidar_hd_pre_transform,
        pre_filter: Optional[Callable] = pre_filter_below_n_points,
        transform: Optional[Callable] = None,
        tile_width: Number = 1000,
        subtile_width: Number = 50,
        subtile_overlap: Number = 0,
    ):
        self.las_file = las_file
        self.epsg = epsg
        self.points_pre_transform = points_pre_transform
        self.pre_filter = pre_filter
        self.transform = transform
        self.tile_width = tile_width
        self.subtile_width = subtile_width
        self.subtile_overlap = subtile_overlap

    def __iter__(self) -> Iterator[dict]:
        return self.get_iterator()

    def get_iterator(self) -> Iterator[dict]:
        """Yield subtiles from the tile in an exhaustive fashion."""
        for idx_in_original_cloud, sample_points in split_cloud_into_samples(
            self.las_file,
            self.tile_width,
            self.subtile_width,
            self.epsg,
            self.subtile_overlap,
        ):
            sample_data = self.points_pre_transform(sample_points)
            sample_data["idx_in_original_cloud"] = idx_in_original_cloud

            if self.pre_filter and self.pre_filter(sample_data):
                continue
            if self.transform:
                sample_data = self.transform(sample_data)
            if sample_data is None:
                continue
            if self.pre_filter and self.pre_filter(sample_data):
                continue
            yield sample_data
