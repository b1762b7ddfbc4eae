"""Interpolator unit tests: overlap merging, channel derivation, LAS write
(reference ``myria3d/models/interpolation.py`` semantics)."""

import os
from contextlib import contextmanager

import numpy as np

from myria3d_tpu.models.interpolation import Interpolator

CLASSIFICATION_DICT = {1: "unclassified", 2: "ground", 6: "building"}


@contextmanager
def _propagating_log():
    """The package logger has propagate=False; let caplog see it."""
    from myria3d_tpu.models import interpolation as mod

    mod.log.propagate = True
    try:
        yield
    finally:
        mod.log.propagate = False


def test_overlap_merge_by_logit_sum():
    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    # two subtiles covering overlapping points 0..3 and 2..5 of a 6-pt cloud
    logits_a = np.zeros((1, 4, 3), np.float32)
    logits_a[0, :, 0] = 1.0  # votes class slot 0
    logits_b = np.zeros((1, 4, 3), np.float32)
    logits_b[0, :, 2] = 3.0  # stronger votes class slot 2
    itp.store_predictions(logits_a, [np.arange(0, 4)])
    itp.store_predictions(logits_b, [np.arange(2, 6)])
    merged = itp.reduce_predicted_logits(6)
    assert merged.shape == (6, 3)
    np.testing.assert_allclose(merged[0], [1, 0, 0])
    np.testing.assert_allclose(merged[2], [1, 0, 3])  # summed in overlap
    np.testing.assert_allclose(merged[5], [0, 0, 3])
    # argmax -> reverse class codes
    codes = itp.reverse_mapper[np.argmax(merged, axis=1)]
    assert codes[0] == 1 and codes[2] == 6


def test_merge_handles_duplicate_and_unsorted_indices():
    """Crop indices are sorted-unique in production (fancy += fast path);
    the duplicate/unsorted fallback must still scatter-ADD exactly."""
    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    logits = np.ones((1, 4, 3), np.float32)
    itp.store_predictions(logits, [np.asarray([3, 1, 1, 0])])
    merged = itp.reduce_predicted_logits(5)
    np.testing.assert_allclose(merged[1], [2, 2, 2])  # duplicate summed
    np.testing.assert_allclose(merged[3], [1, 1, 1])
    np.testing.assert_allclose(merged[2], [0, 0, 0])


def test_prepared_incremental_merge_matches_deferred():
    """prepare(nb_points) switches to scatter-as-batches-arrive; the merged
    plane must be bit-identical to the deferred list-then-reduce path."""
    rng = np.random.default_rng(7)
    n, c = 50, 3
    batches = []
    for lo, hi in [(0, 20), (10, 35), (30, 50), (5, 15)]:
        idx = np.arange(lo, hi)
        batches.append((rng.normal(size=(1, len(idx), c)).astype(np.float32), [idx]))

    legacy = Interpolator(classification_dict=CLASSIFICATION_DICT)
    for logits, idx in batches:
        legacy.store_predictions(logits, idx)
    expected = legacy.reduce_predicted_logits(n)

    inc = Interpolator(classification_dict=CLASSIFICATION_DICT)
    inc.prepare(n)
    for logits, idx in batches:
        inc.store_predictions(logits, idx)
    np.testing.assert_array_equal(inc.reduce_predicted_logits(n), expected)
    # nothing stashed: the incremental path never holds per-batch logits
    assert inc.logits == [] and inc.idx_in_full_cloud == []


def test_prepared_save_uses_handed_over_points(tmp_path):
    """prepare(points=..., header=...) skips the re-read and still writes a
    correct LAS; state resets for the next tile."""
    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las
    from myria3d_tpu.pctl.dataset.utils import read_las_array
    from myria3d_tpu.pctl.io.las import read_las

    src = str(tmp_path / "tile.las")
    write_synthetic_toy_las(src, n_points=500)
    points, header = read_las_array(src, epsg=None)
    n = len(points)

    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    itp.prepare(n, points=points, header=header)
    logits = np.zeros((1, n, 3), np.float32)
    logits[0, :, 1] = 2.0  # everything "ground" (code 2)
    itp.store_predictions(logits, [np.arange(n)])
    # pass a bogus path: with handed-over points it must never be re-read
    out_path = itp.reduce_predictions_and_save(src, str(tmp_path / "out"))
    out = read_las(out_path).points
    assert len(out) == n
    assert np.all(out["PredictedClassification"] == 2)
    assert itp._nb_points is None and itp._points is None  # reset


def test_store_predictions_truncates_to_idx_length():
    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    logits = np.zeros((2, 10, 3), np.float32)  # padded to 10
    itp.store_predictions(logits, [np.arange(4), None])  # only 4 real pts
    assert len(itp.logits) == 1
    assert itp.logits[0].shape == (4, 3)


def test_store_predictions_warns_when_cloud_exceeds_bucket(caplog):
    """Truncation keeps logits/indices aligned AND is surfaced loudly
    (ADVICE r1: silent truncation == silent misclassification)."""
    import logging

    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    logits = np.zeros((1, 8, 3), np.float32)  # bucket M=8
    with _propagating_log(), caplog.at_level(logging.WARNING):
        itp.store_predictions(logits, [np.arange(12)])  # 12 raw points
    assert any("truncated" in r.message for r in caplog.records)
    assert itp.logits[0].shape == (8, 3)
    assert len(itp.idx_in_full_cloud[0]) == 8
    merged = itp.reduce_predicted_logits(12)
    assert merged.shape == (12, 3)


def test_uncovered_points_closed_by_nearest_covered(tmp_path, caplog):
    """``uncovered_policy="nearest"`` (opt-in): points never covered by any
    subtile inherit their nearest covered neighbor's logits — zero-uncovered
    spatial closure."""
    import logging

    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las
    from myria3d_tpu.pctl.io.las import read_las

    src = str(tmp_path / "tile.las")
    write_synthetic_toy_las(src, n_points=1000)
    pts = read_las(src).points
    n = len(pts)

    itp = Interpolator(
        classification_dict=CLASSIFICATION_DICT, uncovered_policy="nearest"
    )
    # cover only the westernmost half of the tile, predicting "building"
    order = np.argsort(pts["X"])
    covered_idx = np.sort(order[: n // 2])
    logits = np.zeros((1, len(covered_idx), 3), np.float32)
    logits[0, :, 2] = 5.0  # class slot 2 = code 6 (building)
    itp.store_predictions(logits, [covered_idx])
    with _propagating_log(), caplog.at_level(logging.INFO):
        out_path = itp.reduce_predictions_and_save(src, str(tmp_path / "out"))
    msgs = [r.message for r in caplog.records]
    assert any("no subtile prediction" in m and "'nearest'" in m for m in msgs)
    out = read_las(out_path).points
    # every point, covered or not, carries the covered half's class — no
    # first-class-code default anywhere
    assert np.all(out["PredictedClassification"] == 6)
    # and the uncovered points' probabilities match a real softmax of the
    # inherited logits, not the uniform default
    ent = out["entropy"]
    assert float(ent.max()) < 1.0  # uniform 3-class entropy would be ~1.099


def test_uncovered_points_keep_policy_reference_parity(tmp_path):
    """Default ``uncovered_policy="keep"``: unpredicted points carry their
    ORIGINAL class code with null probas and null entropy — the reference's
    explicit behavior for artefacts/dropped areas
    (``interpolation.py:155-170``)."""
    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las
    from myria3d_tpu.pctl.io.las import read_las

    src = str(tmp_path / "tile.las")
    write_synthetic_toy_las(src, n_points=1000)
    pts = read_las(src).points
    n = len(pts)

    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    covered_idx = np.arange(n // 2)  # first half covered
    logits = np.zeros((1, len(covered_idx), 3), np.float32)
    logits[0, :, 2] = 5.0  # class slot 2 = code 6 (building)
    itp.store_predictions(logits, [covered_idx])
    out_path = itp.reduce_predictions_and_save(src, str(tmp_path / "out"))
    out = read_las(out_path).points
    cov = np.zeros(n, bool)
    cov[covered_idx] = True
    # covered points predicted; uncovered keep their source class
    assert np.all(out["PredictedClassification"][cov] == 6)
    np.testing.assert_array_equal(
        out["PredictedClassification"][~cov],
        pts["Classification"][~cov].astype(np.uint8),
    )
    # null probas and entropy on the uncovered half
    for ch in ("unclassified", "ground", "building"):
        assert np.all(out[ch][~cov] == 0.0)
    assert np.all(out["entropy"][~cov] == 0.0)
    # covered half has a real distribution
    probas = np.stack(
        [out[ch][cov] for ch in ("unclassified", "ground", "building")], -1
    )
    np.testing.assert_allclose(probas.sum(-1), 1.0, atol=1e-5)


def test_all_points_uncovered_warns_and_defaults(tmp_path, caplog):
    import logging

    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las

    src = str(tmp_path / "tile.las")
    write_synthetic_toy_las(src, n_points=200)
    itp = Interpolator(classification_dict=CLASSIFICATION_DICT)
    with _propagating_log(), caplog.at_level(logging.WARNING):
        out_path = itp.reduce_predictions_and_save(src, str(tmp_path / "out"))
    assert any("No point" in r.message for r in caplog.records)
    assert os.path.isfile(out_path)


def test_reduce_and_save_las(tmp_path):
    from myria3d_tpu.pctl.dataset.toy_dataset import write_synthetic_toy_las
    from myria3d_tpu.pctl.io.las import read_las

    src = str(tmp_path / "tile.las")
    write_synthetic_toy_las(src, n_points=2000)
    n = len(read_las(src).points)

    itp = Interpolator(
        classification_dict=CLASSIFICATION_DICT, probas_to_save=["ground"]
    )
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(1, n, 3)).astype(np.float32)
    itp.store_predictions(logits, [np.arange(n)])
    out_path = itp.reduce_predictions_and_save(src, str(tmp_path / "out"))
    assert os.path.isfile(out_path)
    out = read_las(out_path)
    assert len(out.points) == n
    names = out.points.dtype.names
    assert "PredictedClassification" in names and "entropy" in names
    assert "ground" in names and "building" not in names
    # accumulators reset for the next tile
    assert itp.logits == [] and itp.idx_in_full_cloud == []
    # codes map back into the original class-code space
    assert set(np.unique(out.points["PredictedClassification"])) <= {1, 2, 6}
