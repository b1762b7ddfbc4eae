"""HDF5-backed sample store: the single owner of all h5py choreography.

On-disk schema is kept byte-compatible with caches produced by the
reference's ``create_hdf5`` (``myria3d/pctl/dataset/hdf5.py:197-293``) so
existing dataset files keep working:

    {split}/{basename}/{NNNNN}/{x, pos, y, idx_in_original_cloud}
    {split}/{basename}.attrs["is_complete"]     — tile fully ingested
    x.attrs["x_features_names"]                 — feature column names
    /samples_hdf5_paths                         — vlen-str sample index

The code around the schema is organized differently from the reference:
write, resume and indexing live here behind three verbs (``tile_status`` /
``ingest_tile`` / ``read``), the cached index is invalidated on ingest
instead of silently going stale, and reads go through one lazily-opened
per-process handle guarded by a lock (safe under the thread-pool loader).
"""

from __future__ import annotations

import os
import threading
from typing import Iterable, List, Optional

import h5py
import numpy as np

SPLITS = ("train", "val", "test")
INDEX_KEY = "samples_hdf5_paths"

TILE_ABSENT = "absent"
TILE_PARTIAL = "partial"
TILE_COMPLETE = "complete"


class HDF5SampleStore:
    """Grouped subtile-sample cache in a single HDF5 file."""

    def __init__(self, path: str):
        self.path = path
        self._reader: Optional[h5py.File] = None
        self._reader_lock = threading.Lock()
        self._paths_cache: Optional[List[str]] = None

    # ------------------------------------------------------------------
    # Write side
    # ------------------------------------------------------------------

    def tile_status(self, split: str, basename: str) -> str:
        """absent | partial (interrupted ingest) | complete."""
        if not os.path.isfile(self.path):
            return TILE_ABSENT
        with h5py.File(self.path, "r") as f:
            grp = f.get(f"{split}/{basename}")
            if grp is None:
                return TILE_ABSENT
            return (
                TILE_COMPLETE if "is_complete" in grp.attrs else TILE_PARTIAL
            )

    def drop_tile(self, split: str, basename: str) -> None:
        with h5py.File(self.path, "a") as f:
            key = f"{split}/{basename}"
            if key in f:
                del f[key]

    def ingest_tile(
        self, split: str, basename: str, samples: Iterable[dict]
    ) -> int:
        """Write every sample of one tile; mark ``is_complete`` last so an
        interrupted ingest is detectable. A tile with zero surviving samples
        still gets its (empty, complete) group — it must not be redone on
        every resume. Returns the number of samples written."""
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        count = 0
        with h5py.File(self.path, "a") as f:
            tile = f.require_group(split).create_group(basename)
            for count, sample in enumerate(samples, start=1):
                grp = tile.create_group(f"{count - 1:05d}")
                ds = grp.create_dataset("x", data=np.asarray(sample["x"], np.float32))
                ds.attrs["x_features_names"] = list(sample["x_features_names"])
                grp.create_dataset("pos", data=np.asarray(sample["pos"], np.float32))
                grp.create_dataset("y", data=np.asarray(sample["y"], np.int32))
                grp.create_dataset(
                    "idx_in_original_cloud",
                    data=np.asarray(sample["idx_in_original_cloud"], np.int32),
                )
            tile.attrs["is_complete"] = True
            # new samples invalidate any cached index
            if INDEX_KEY in f:
                del f[INDEX_KEY]
        self._paths_cache = None
        return count

    # ------------------------------------------------------------------
    # Read side
    # ------------------------------------------------------------------

    def _walk_sample_paths(self, f: h5py.File) -> List[str]:
        paths: List[str] = []
        for split in SPLITS:
            split_grp = f.get(split)
            if split_grp is None:
                continue
            for basename, tile in split_grp.items():
                paths.extend(
                    f"{split}/{basename}/{number}" for number in tile.keys()
                )
        return paths

    def sample_paths(self) -> List[str]:
        """All sample paths, cached in memory and inside the file."""
        if self._paths_cache is not None:
            return self._paths_cache
        with h5py.File(self.path, "a") as f:
            if INDEX_KEY in f:
                paths = [
                    p.decode() if isinstance(p, bytes) else str(p)
                    for p in f[INDEX_KEY]
                ]
            else:
                paths = self._walk_sample_paths(f)
                f.create_dataset(
                    INDEX_KEY,
                    (len(paths),),
                    dtype=h5py.special_dtype(vlen=str),
                    data=paths,
                )
        self._paths_cache = paths
        return paths

    def split_paths(self, split: str) -> List[str]:
        prefix = f"{split}/"
        return [p for p in self.sample_paths() if p.startswith(prefix)]

    def read(self, sample_path: str) -> dict:
        """Load one sample as a numpy dict (lazy per-process handle)."""
        with self._reader_lock:
            if self._reader is None:
                self._reader = h5py.File(self.path, "r")
            grp = self._reader[sample_path]
            names = grp["x"].attrs["x_features_names"]
            return {
                "x": grp["x"][...],
                "pos": grp["pos"][...],
                "y": grp["y"][...].astype(np.int64),
                "idx_in_original_cloud": grp["idx_in_original_cloud"][...],
                "x_features_names": [
                    n if isinstance(n, str) else n.decode() for n in names
                ],
            }

    def close(self) -> None:
        with self._reader_lock:
            if self._reader is not None:
                self._reader.close()
                self._reader = None
