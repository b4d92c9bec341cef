"""Unit tests for exact-integer Douglas-Peucker simplification."""

import numpy as np

from proj_spark.spatial.simplify import dp_keep_mask, simplify_stats


def test_collinear_collapses_to_endpoints():
    xs = np.arange(10, dtype=np.int64) * 1_000_000
    ys = np.zeros(10, dtype=np.int64)
    keep = dp_keep_mask(xs, ys, 0)
    assert keep.tolist() == [True] + [False] * 8 + [True]


def test_spike_is_kept():
    xs = np.array([0, 1, 2, 3, 4], dtype=np.int64) * 1_000_000
    ys = np.array([0, 0, 5_000_000, 0, 0], dtype=np.int64)
    # spike area vs the full chord = |4e6 * 5e6| = 2e13 > tol; the
    # neighbors deviate 5e12 from the split sub-chords -> collapse
    keep = dp_keep_mask(xs, ys, 6 * 10**12)
    assert keep.tolist() == [True, False, True, False, True]


def test_below_tolerance_dropped():
    xs = np.array([0, 1, 2], dtype=np.int64) * 1_000_000
    ys = np.array([0, 10, 0], dtype=np.int64)
    # area = |2e6 * 10| = 2e7
    assert dp_keep_mask(xs, ys, 2 * 10**7).tolist() == [True, False, True]
    assert dp_keep_mask(xs, ys, 2 * 10**7 - 1).tolist() == [True, True, True]


def test_tie_splits_at_first_index():
    # two equal-deviation points; the FIRST must become the split
    xs = np.array([0, 1, 3, 4], dtype=np.int64) * 1_000_000
    ys = np.array([0, 2_000_000, -2_000_000, 0], dtype=np.int64)
    keep = dp_keep_mask(xs, ys, 10**6)
    assert keep.all()  # both survive (each spikes vs the sub-chords)
    keep2 = dp_keep_mask(xs, ys, 10**18)
    assert keep2.tolist() == [True, False, False, True]


def test_tiny_paths():
    one = np.array([5], dtype=np.int64)
    assert dp_keep_mask(one, one, 0).tolist() == [True]
    two = np.array([1, 2], dtype=np.int64)
    assert dp_keep_mask(two, two, 0).tolist() == [True, True]


def test_simplify_stats_spark(spark):
    rows = [("d1", s, 0.0, float(s)) for s in range(8)]  # straight line
    rows += [("d2", 0, 0.0, 0.0), ("d2", 1, 5.0, 1.0), ("d2", 2, 0.0, 2.0)]
    pts = spark.createDataFrame(
        rows, "domain string, seq long, lat double, lon double")
    out = {r.domain: r for r in simplify_stats(pts, 10**10).collect()}
    assert out["d1"].n_kept == 2
    assert out["d1"].kept_seq_sum == 0 + 7
    assert out["d2"].n_kept == 3  # the 5-degree spike survives
    assert out["d2"].kept_frac == 1.0
