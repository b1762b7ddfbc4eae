"""Per-process input sharding in PaddedBatchLoader (DistributedSampler
analog — the reference gets disjoint per-rank batches from Lightning DDP,
``configs/experiment/RandLaNet_base_run_FR-2x3GPUs.yaml:13-18``).

Simulated here with explicit process_index/process_count so both "ranks"
run in one process; the 2-OS-process path over the real datamodule is in
``test_multiprocess_distributed.py``.
"""

import numpy as np

from myria3d_tpu.pctl.batching import IGNORE_INDEX
from myria3d_tpu.pctl.loader import PaddedBatchLoader

N_PTS, D_IN = 100, 4


class FakeDataset:
    """Map-style dataset; indices in ``none_at`` filter to None."""

    def __init__(self, n, none_at=()):
        self.n = n
        self.none_at = set(none_at)
        self.requested = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.requested.append(i)
        if i in self.none_at:
            return None
        rng = np.random.default_rng(i)
        return {
            "pos": rng.uniform(-1, 1, (N_PTS, 3)).astype(np.float32),
            "x": rng.uniform(0, 1, (N_PTS, D_IN)).astype(np.float32),
            "y": np.full(N_PTS, i % 5, np.int32),
        }


def _loader(ds, rank, count, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("buckets", (128,))
    kw.setdefault("num_workers", 1)
    return PaddedBatchLoader(
        ds, shard_by_process=True, process_index=rank, process_count=count,
        **kw,
    )


def test_disjoint_cover_and_aligned_batch_counts():
    n = 10
    consumed = []
    batch_counts = []
    for rank in range(2):
        ds = FakeDataset(n)
        loader = _loader(ds, rank, 2, shuffle=True, seed=7)
        batches = list(loader)
        batch_counts.append(len(batches))
        assert len(batches) == len(loader)
        consumed.append(set(ds.requested))
        for b in batches:
            assert b.pos.shape == (2, 128, 3)  # shared top bucket
    assert batch_counts[0] == batch_counts[1]
    assert consumed[0].isdisjoint(consumed[1])
    assert consumed[0] | consumed[1] == set(range(n))


def test_shared_permutation_requires_same_seed_epoch():
    ds0, ds1 = FakeDataset(9), FakeDataset(9)
    l0 = _loader(ds0, 0, 2, shuffle=True, seed=3)
    l1 = _loader(ds1, 1, 2, shuffle=True, seed=3)
    list(l0), list(l1)
    # 9 wrap-pads to 10: exactly one sample appears on both ranks
    dup = set(ds0.requested) & set(ds1.requested)
    assert len(dup) == 1
    assert set(ds0.requested) | set(ds1.requested) == set(range(9))
    # per-rank shares are equal → equal batch counts
    assert len(ds0.requested) == len(ds1.requested) == 5


def test_none_samples_shrink_batch_without_shifting_boundaries():
    # rank 0 of 2 over 8 samples: local indices [0,2,4,6] → 2 groups of 2.
    # A None inside a group must NOT pull a sample from the next group
    # (that would desync the ranks' batch counts). 2 and 6 are None here,
    # so each group keeps exactly one valid sample.
    ds = FakeDataset(8, none_at={2, 6})
    loader = _loader(ds, 0, 2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    # each group contributed its surviving sample; fillers pad the rest
    for b in batches:
        assert int(b.num_valid.astype(bool).sum()) == 1
        assert b.mask.shape == (2, 128)


def test_all_none_group_emits_filler_batch():
    # group 2 (indices 4, 6 for rank 0) is entirely None → filler batch
    ds = FakeDataset(8, none_at={4, 6})
    loader = _loader(ds, 0, 2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    filler = batches[1]
    assert not filler.mask.any()
    assert (filler.y == IGNORE_INDEX).all()
    assert filler.x.shape == (2, 128, D_IN)  # feature width cached
    assert (filler.num_valid == 0).all()


def test_unsharded_default_is_unchanged():
    ds = FakeDataset(5)
    loader = PaddedBatchLoader(ds, batch_size=2, buckets=(128,), num_workers=1)
    batches = list(loader)  # process_count==1 → legacy path
    assert len(batches) == 3
    assert set(ds.requested) == set(range(5))
