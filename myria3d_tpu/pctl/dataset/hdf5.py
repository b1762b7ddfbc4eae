"""Single-file HDF5 dataset for collections of large LAS tiles.

Re-implements reference ``myria3d/pctl/dataset/hdf5.py``: ``create_hdf5``
(``:197-293``) with per-LAS ``is_complete`` resume, and a map-style
``HDF5Dataset`` (``:25-194``) with a lazy per-process file handle and an
in-file sample index. Samples are numpy dicts (see ``pctl.transforms``).
"""

from __future__ import annotations

import copy
import os
import os.path as osp
from numbers import Number
from typing import Callable, List, Optional

import h5py
import numpy as np

from myria3d_tpu.pctl.dataset.utils import (
    LAS_PATHS_BY_SPLIT_DICT_TYPE,
    pre_filter_below_n_points,
    split_cloud_into_samples,
)
from myria3d_tpu.pctl.points_pre_transform.lidar_hd import lidar_hd_pre_transform


class HDF5Dataset:
    """Map-style dataset over a single HDF5 cache file."""

    def __init__(
        self,
        hdf5_file_path: str,
        epsg: Optional[str],
        las_paths_by_split_dict: Optional[LAS_PATHS_BY_SPLIT_DICT_TYPE],
        points_pre_transform: Callable = lidar_hd_pre_transform,
        tile_width: Number = 1000,
        subtile_width: Number = 50,
        subtile_overlap_train: Number = 0,
        pre_filter: Optional[Callable] = pre_filter_below_n_points,
        train_transform: Optional[Callable] = None,
        eval_transform: Optional[Callable] = None,
    ):
        self.points_pre_transform = points_pre_transform
        self.pre_filter = pre_filter
        self.train_transform = train_transform
        self.eval_transform = eval_transform

        self.tile_width = tile_width
        self.subtile_width = subtile_width
        self.subtile_overlap_train = subtile_overlap_train

        self.hdf5_file_path = hdf5_file_path

        # Lazy: opened within __getitem__ to be worker-process safe
        # (reference hdf5.py:115-138).
        self.dataset: Optional[h5py.File] = None
        self._samples_hdf5_paths: Optional[List[str]] = None

        if not las_paths_by_split_dict:
            if not os.path.isfile(hdf5_file_path):
                raise FileNotFoundError(
                    f"No LAS paths given and no precomputed HDF5 at {hdf5_file_path}"
                )
            return

        create_hdf5(
            las_paths_by_split_dict,
            hdf5_file_path,
            epsg,
            tile_width,
            subtile_width,
            pre_filter,
            subtile_overlap_train,
            points_pre_transform,
        )
        self.samples_hdf5_paths  # build the in-file index now

    def __getitem__(self, idx: int) -> Optional[dict]:
        sample_hdf5_path = self.samples_hdf5_paths[idx]
        data = self._get_data(sample_hdf5_path)

        if self.pre_filter and self.pre_filter(data):
            return None

        transform = self.train_transform
        if sample_hdf5_path.startswith("val") or sample_hdf5_path.startswith("test"):
            transform = self.eval_transform
        if transform:
            data = transform(data)

        if data is None or (self.pre_filter and self.pre_filter(data)):
            return None
        return data

    def _get_data(self, sample_hdf5_path: str) -> dict:
        if self.dataset is None:
            self.dataset = h5py.File(self.hdf5_file_path, "r")
        grp = self.dataset[sample_hdf5_path]
        return {
            "x": grp["x"][...],
            "pos": grp["pos"][...],
            "y": grp["y"][...].astype(np.int64),
            "idx_in_original_cloud": grp["idx_in_original_cloud"][...],
            "x_features_names": [
                n if isinstance(n, str) else n.decode()
                for n in grp["x"].attrs["x_features_names"]
            ],
        }

    def __len__(self) -> int:
        return len(self.samples_hdf5_paths)

    @property
    def traindata(self):
        return self._get_split_subset("train")

    @property
    def valdata(self):
        return self._get_split_subset("val")

    @property
    def testdata(self):
        return self._get_split_subset("test")

    def _get_split_subset(self, split: str) -> "Subset":
        indices = [
            idx for idx, p in enumerate(self.samples_hdf5_paths) if p.startswith(split)
        ]
        return Subset(self, indices)

    @property
    def samples_hdf5_paths(self) -> List[str]:
        """Index all samples in the dataset (cached in the HDF5 file,
        reference ``hdf5.py:160-194``)."""
        if self._samples_hdf5_paths:
            return self._samples_hdf5_paths

        with h5py.File(self.hdf5_file_path, "r") as f:
            if "samples_hdf5_paths" in f:
                self._samples_hdf5_paths = [
                    p.decode("utf-8") if isinstance(p, bytes) else str(p)
                    for p in f["samples_hdf5_paths"]
                ]
                return self._samples_hdf5_paths

        self._samples_hdf5_paths = []
        with h5py.File(self.hdf5_file_path, "r") as f:
            for split in f.keys():
                if split not in ["train", "val", "test"]:
                    continue
                for basename in f[split].keys():
                    for sample_number in f[split][basename].keys():
                        self._samples_hdf5_paths.append(
                            osp.join(split, basename, sample_number)
                        )

        with h5py.File(self.hdf5_file_path, "a") as f:
            variable_length_str = h5py.special_dtype(vlen=str)
            f.create_dataset(
                "samples_hdf5_paths",
                (len(self._samples_hdf5_paths),),
                dtype=variable_length_str,
                data=self._samples_hdf5_paths,
            )
        return self._samples_hdf5_paths


class Subset:
    """View over a subset of dataset indices (torch.utils.data.Subset-lite)."""

    def __init__(self, dataset, indices: List[int]):
        self.dataset = dataset
        self.indices = indices

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]

    def __len__(self) -> int:
        return len(self.indices)


def create_hdf5(
    las_paths_by_split_dict: dict,
    hdf5_file_path: str,
    epsg: Optional[str],
    tile_width: Number = 1000,
    subtile_width: Number = 50,
    pre_filter: Optional[Callable] = pre_filter_below_n_points,
    subtile_overlap_train: Number = 0,
    points_pre_transform: Callable = lidar_hd_pre_transform,
) -> None:
    """Create an HDF5 dataset file from LAS tiles (reference ``hdf5.py:197-293``).

    Per split, per LAS: subtiles are extracted, pre-transformed, filtered and
    written under ``{split}/{basename}/{NNNNN}``. A per-LAS ``is_complete``
    attribute enables resume after interrupted preparation: incomplete LAS
    groups are deleted and redone.
    """
    dirname = os.path.dirname(hdf5_file_path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)
    for split, las_paths in las_paths_by_split_dict.items():
        with h5py.File(hdf5_file_path, "a") as f:
            if split not in f:
                f.create_group(split)
        for las_path in las_paths:
            basename = os.path.basename(las_path)

            with h5py.File(hdf5_file_path, "a") as hdf5_file:
                if (
                    basename in hdf5_file[split]
                    and "is_complete" not in hdf5_file[split][basename].attrs
                ):
                    del hdf5_file[split][basename]
            with h5py.File(hdf5_file_path, "a") as hdf5_file:
                if basename in hdf5_file[split]:
                    continue
                # Create the group up front so a LAS whose subtiles are all
                # pre-filtered out still gets is_complete and is not redone
                # on every resume run.
                hdf5_file[split].create_group(basename)

                subtile_overlap = subtile_overlap_train if split == "train" else 0
                for sample_number, (sample_idx, sample_points) in enumerate(
                    split_cloud_into_samples(
                        las_path, tile_width, subtile_width, epsg, subtile_overlap
                    )
                ):
                    if not points_pre_transform:
                        continue
                    data = points_pre_transform(sample_points)
                    if pre_filter is not None and pre_filter(data):
                        continue
                    hdf5_path = os.path.join(split, basename, str(sample_number).zfill(5))
                    x_path = os.path.join(hdf5_path, "x")
                    hdf5_file.create_dataset(x_path, data["x"].shape, dtype="f", data=data["x"])
                    hdf5_file[x_path].attrs["x_features_names"] = copy.deepcopy(
                        data["x_features_names"]
                    )
                    hdf5_file.create_dataset(
                        os.path.join(hdf5_path, "pos"),
                        data["pos"].shape, dtype="f", data=data["pos"],
                    )
                    hdf5_file.create_dataset(
                        os.path.join(hdf5_path, "y"),
                        data["y"].shape, dtype="i", data=data["y"],
                    )
                    hdf5_file.create_dataset(
                        os.path.join(hdf5_path, "idx_in_original_cloud"),
                        sample_idx.shape, dtype="i", data=sample_idx,
                    )

                hdf5_file[split][basename].attrs["is_complete"] = True
