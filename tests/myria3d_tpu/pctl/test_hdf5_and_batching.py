"""HDF5 dataset build/resume + padded batching + datamodule tests."""

import h5py
import numpy as np
import pytest

from myria3d_tpu.pctl.batching import (
    IGNORE_INDEX,
    PointCloudBatch,
    bucket_size,
    collate_padded,
    pad_full_cloud,
)
from myria3d_tpu.pctl.dataset.hdf5 import HDF5Dataset
from myria3d_tpu.pctl.loader import PaddedBatchLoader


def test_toy_hdf5_structure(toy_dataset_hdf5_path):
    with h5py.File(toy_dataset_hdf5_path, "r") as f:
        assert set(f.keys()) >= {"train", "val", "test", "samples_hdf5_paths"}
        for split in ("train", "val", "test"):
            basenames = list(f[split].keys())
            assert len(basenames) == 1
            grp = f[split][basenames[0]]
            assert grp.attrs["is_complete"]
            sample = grp[list(grp.keys())[0]]
            assert sample["x"].shape[1] == 9
            assert sample["pos"].shape[1] == 3
            assert list(sample["x"].attrs["x_features_names"])[:3] == [
                "Intensity", "ReturnNumber", "NumberOfReturns",
            ]


def test_hdf5_dataset_getitem_and_splits(toy_dataset_hdf5_path):
    ds = HDF5Dataset(toy_dataset_hdf5_path, "2154", las_paths_by_split_dict=None)
    assert len(ds) > 0
    assert len(ds.traindata) + len(ds.valdata) + len(ds.testdata) == len(ds)
    sample = ds.traindata[0]
    assert sample["pos"].shape[0] == sample["x"].shape[0] == sample["y"].shape[0]
    assert sample["idx_in_original_cloud"].shape[0] == sample["pos"].shape[0]


def test_incomplete_group_resume(tmp_path, toy_las_path):
    """Interrupted-prep resume: incomplete LAS groups are deleted & redone."""
    from myria3d_tpu.pctl.dataset.hdf5 import create_hdf5
    import os

    hdf5 = str(tmp_path / "resume.hdf5")
    splits = {"train": [toy_las_path]}
    create_hdf5(splits, hdf5, "2154", tile_width=110, subtile_width=50)
    basename = os.path.basename(toy_las_path)
    with h5py.File(hdf5, "a") as f:
        n_before = len(f["train"][basename].keys())
        del f["train"][basename].attrs["is_complete"]  # simulate interruption
    create_hdf5(splits, hdf5, "2154", tile_width=110, subtile_width=50)
    with h5py.File(hdf5, "a") as f:
        assert f["train"][basename].attrs["is_complete"]
        assert len(f["train"][basename].keys()) == n_before


def test_all_filtered_las_marked_complete(tmp_path, toy_las_path):
    """A LAS whose subtiles are all pre-filtered out must still be marked
    is_complete so it is not reprocessed on every resume (ADVICE r1)."""
    from myria3d_tpu.pctl.dataset.hdf5 import create_hdf5
    import os

    hdf5 = str(tmp_path / "empty.hdf5")
    splits = {"train": [toy_las_path]}
    drop_all = lambda data: True  # noqa: E731
    create_hdf5(splits, hdf5, "2154", tile_width=110, subtile_width=50,
                pre_filter=drop_all)
    basename = os.path.basename(toy_las_path)
    with h5py.File(hdf5, "r") as f:
        assert basename in f["train"]
        assert f["train"][basename].attrs["is_complete"]
        assert len(f["train"][basename].keys()) == 0
    # resume run must skip it (group untouched, still complete)
    create_hdf5(splits, hdf5, "2154", tile_width=110, subtile_width=50,
                pre_filter=drop_all)
    with h5py.File(hdf5, "r") as f:
        assert f["train"][basename].attrs["is_complete"]


def test_bucket_size():
    assert bucket_size(1, (512, 1024)) == 512
    assert bucket_size(513, (512, 1024)) == 1024
    # grows past the ladder top instead of truncating (ADVICE r1)
    assert bucket_size(9999, (512, 1024)) == 1024 + 16384
    assert bucket_size(1024 + 16384, (512, 1024)) == 1024 + 16384
    assert bucket_size(1024 + 16385, (512, 1024)) == 1024 + 2 * 16384
    from myria3d_tpu.pctl.batching import DEFAULT_FULL_BUCKETS
    n = 200_000  # denser than the top full bucket (131072)
    grown = bucket_size(n, DEFAULT_FULL_BUCKETS)
    assert grown >= n and grown % 128 == 0


def _mk_sample(n, f=4):
    return {
        "pos": np.random.rand(n, 3).astype(np.float32),
        "x": np.random.rand(n, f).astype(np.float32),
        "y": np.random.randint(0, 7, n).astype(np.int64),
        "idx_in_original_cloud": np.arange(n),
    }


def test_collate_padded_shapes_and_masks():
    batch = collate_padded([_mk_sample(100), _mk_sample(700), None], 4, (512, 1024))
    assert isinstance(batch, PointCloudBatch)
    assert batch.pos.shape == (4, 1024, 3)
    assert batch.x.shape == (4, 1024, 4)
    assert batch.mask.sum() == 800
    assert batch.num_valid.tolist() == [100, 700, 0, 0]
    # pads: y == ignore, mask False
    assert (batch.y[0, 100:] == IGNORE_INDEX).all()
    assert not batch.mask[2].any()


def test_collate_all_none_returns_none():
    assert collate_padded([None, None], 2) is None


def test_pad_full_cloud():
    copies = [
        {"pos_copy": np.random.rand(50, 3).astype(np.float32),
         "transformed_y_copy": np.random.randint(0, 7, 50),
         "pos_sampled_copy": np.random.rand(20, 3).astype(np.float32)},
        {},
    ]
    out = pad_full_cloud(copies, buckets=(64, 128))
    assert out["full_pos"].shape == (2, 64, 3)
    assert out["full_mask"][0].sum() == 50
    assert not out["full_mask"][1].any()
    assert out["full_y"].shape == (2, 64)
    assert out["full_lengths"].tolist() == [50, 0]


def test_padded_batch_loader(toy_dataset_hdf5_path):
    ds = HDF5Dataset(toy_dataset_hdf5_path, "2154", las_paths_by_split_dict=None)
    loader = PaddedBatchLoader(ds.traindata, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b.pos.shape[0] == 2
        assert b.pos.shape[1] % 128 == 0
        assert b.mask.any()


def test_datamodule_end_to_end(toy_dataset_hdf5_path):
    from tests.conftest import make_default_hydra_cfg
    from myria3d_tpu.utils.config import instantiate

    cfg = make_default_hydra_cfg(
        [
            "datamodule.hdf5_file_path=" + toy_dataset_hdf5_path,
            "datamodule.batch_size=2",
        ]
    )
    dm = instantiate(cfg.datamodule)
    dm.prepare_data()
    train_batches = list(dm.train_dataloader())
    assert train_batches, "no train batches"
    b = train_batches[0]
    assert b.x.shape[2] == 9
    # train y remapped to consecutive codes (or 65 pad)
    valid_y = b.y[b.mask]
    assert ((valid_y < 7) | (valid_y == 65)).all()
    # eval batches carry copies for interpolation
    val_batches = list(dm.val_dataloader())
    assert any("pos_copy" in c for batch in val_batches for c in batch.copies)


def test_store_pread_fast_path_matches_h5py(toy_dataset_hdf5_path):
    """The raw-pread read path must be byte-identical to the h5py read it
    replaces (per-thread parallel reads; store.py read side)."""
    from myria3d_tpu.pctl.dataset.store import HDF5SampleStore

    store = HDF5SampleStore(toy_dataset_hdf5_path)
    path = store.sample_paths()[0]
    fast = store.read(path)
    # datasets written by ingest_tile are contiguous -> pread path taken
    assert all(
        store._meta[path][1][n][0] is not None
        for n in ("x", "pos", "y", "idx_in_original_cloud")
    )
    with h5py.File(toy_dataset_hdf5_path, "r") as f:
        grp = f[path]
        np.testing.assert_array_equal(fast["x"], grp["x"][...])
        np.testing.assert_array_equal(fast["pos"], grp["pos"][...])
        np.testing.assert_array_equal(fast["y"], grp["y"][...])
        np.testing.assert_array_equal(
            fast["idx_in_original_cloud"], grp["idx_in_original_cloud"][...]
        )
    assert fast["y"].dtype == np.int64
    assert fast["x"].flags.writeable
    store.close()


def test_store_concurrent_reads_across_threads(toy_dataset_hdf5_path):
    """N loader threads read through per-thread handles/fds without a shared
    lock; results identical to serial reads, incl. after a close() bumping
    the handle generation."""
    from concurrent.futures import ThreadPoolExecutor

    from myria3d_tpu.pctl.dataset.store import HDF5SampleStore

    store = HDF5SampleStore(toy_dataset_hdf5_path)
    paths = store.sample_paths() * 4
    serial = [store.read(p)["pos"].sum() for p in paths]
    store.close()  # threads must survive a generation bump
    with ThreadPoolExecutor(max_workers=4) as pool:
        parallel = list(pool.map(lambda p: store.read(p)["pos"].sum(), paths))
    np.testing.assert_allclose(serial, parallel)
    # one fd/handle per participating thread, not per read
    assert len(store._fds) <= 4
    store.close()
    assert store._fds == [] and store._h5_handles == []
