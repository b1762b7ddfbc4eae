"""PaddedBatchLoader semantics: none-proofing, bucketing, shuffling,
background prefetch (reference GeometricNoneProofDataloader analog)."""

import numpy as np
import pytest

from myria3d_tpu.pctl.batching import collate_padded
from myria3d_tpu.pctl.loader import BackgroundIterator, PaddedBatchLoader


def _sample(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pos": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "x": rng.uniform(0, 1, (n, 9)).astype(np.float32),
        "y": rng.integers(0, 7, n).astype(np.int32),
    }


class ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_none_samples_dropped_and_batch_padded():
    ds = ListDataset([_sample(100), None, _sample(200), None])
    loader = PaddedBatchLoader(ds, batch_size=4, buckets=(256,))
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b.pos.shape == (4, 256, 3)       # batch dim always batch_size
    assert list(b.num_valid) == [100, 200, 0, 0]
    assert b.mask[0].sum() == 100 and not b.mask[2].any()
    # pad targets carry the ignore code
    assert (b.y[0][100:] == 65).all()


def test_all_none_yields_nothing():
    ds = ListDataset([None, None, None])
    assert list(PaddedBatchLoader(ds, batch_size=2)) == []


def test_bucket_ladder_selection():
    ds = ListDataset([_sample(100), _sample(900)])
    loader = PaddedBatchLoader(ds, batch_size=2, buckets=(128, 512, 1024))
    (b,) = list(loader)
    assert b.num_points == 1024  # max sample picks the bucket


def test_shuffle_changes_order_deterministically():
    samples = [_sample(10 + i, seed=i) for i in range(8)]
    ds = ListDataset(samples)

    def order(seed, epoch=0):
        loader = PaddedBatchLoader(
            ds, batch_size=8, shuffle=True, seed=seed, buckets=(32,)
        )
        loader.set_epoch(epoch)
        (b,) = list(loader)
        return list(b.num_valid)

    assert order(1) == order(1)            # deterministic per seed
    assert order(1) != order(2) or order(1) != order(3)


def test_background_iterator_passthrough_and_errors():
    assert list(BackgroundIterator(iter([1, 2, 3]))) == [1, 2, 3]

    def boom():
        yield 1
        raise RuntimeError("boom")

    it = BackgroundIterator(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_background_iterator_close_unblocks_producer():
    # A consumer that stops reading early (preemption break) must be able
    # to stop the producer thread even while it is blocked on a full queue.
    produced = []

    def slow_source():
        for i in range(1000):
            produced.append(i)
            yield i

    it = BackgroundIterator(slow_source(), max_prefetch=2)
    assert next(it) == 0
    it.close()
    assert not it._thread.is_alive()
    # close is idempotent and iteration afterwards terminates cleanly
    it.close()
    assert list(it) == []
    assert len(produced) < 1000  # the source was NOT drained


def test_background_iterator_done_survives_full_queue():
    # Producer finishing against a full queue must still deliver the
    # DONE sentinel once the consumer catches up (no lost-terminator hang).
    import time

    it = BackgroundIterator(iter([1, 2, 3]), max_prefetch=1)
    time.sleep(0.3)  # let the producer fill the queue and finish
    assert list(it) == [1, 2, 3]


def test_collate_rejects_oversized_batch():
    with pytest.raises(ValueError):
        collate_padded([_sample(10)] * 3, batch_size=2)


def test_background_iterator_close_reports_pending_error(caplog):
    # A producer error that races a preemption close must not vanish
    # silently (ADVICE r2): close() logs the discarded exception.
    import logging
    import time

    def early_boom():
        yield 1
        raise RuntimeError("pipeline died")

    it = BackgroundIterator(early_boom(), max_prefetch=2)
    assert next(it) == 1
    time.sleep(0.2)  # let the producer hit the error
    with caplog.at_level(logging.WARNING, logger="myria3d_tpu.pctl.loader"):
        assert it.close() is True
    assert any("pipeline died" in r.message for r in caplog.records)


def test_background_iterator_close_returns_false_on_stuck_producer(caplog):
    # close() cannot interrupt a producer blocked inside the source
    # iterator itself; it reports that by returning False (ADVICE r2).
    import logging
    import threading

    release = threading.Event()

    def stuck_source():
        yield 1
        release.wait(timeout=30)
        yield 2

    it = BackgroundIterator(stuck_source(), max_prefetch=2)
    assert next(it) == 1
    with caplog.at_level(logging.WARNING, logger="myria3d_tpu.pctl.loader"):
        ok = it.close(timeout=0.2)
    assert ok is False
    assert any("still finishing" in r.message for r in caplog.records)
    release.set()  # let the daemon thread exit before the test returns
    it._thread.join(timeout=5)


def test_background_iterator_error_not_double_logged(caplog):
    # An error already re-raised to the consumer is not re-warned by the
    # trainer's unconditional finally-close.
    import logging

    def boom():
        yield 1
        raise RuntimeError("boom-once")

    it = BackgroundIterator(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)
    with caplog.at_level(logging.WARNING, logger="myria3d_tpu.pctl.loader"):
        it.close()
    assert not any("boom-once" in r.message for r in caplog.records)
