"""QC accumulators vs a direct per-read reimplementation of the reference
semantics (reference multiplex.h:28-182, multiplex.cpp:25-295)."""

import numpy as np

from pheniqs_tpu.report.quality import (
    IUPAC_CODE_SIZE,
    SegmentQualityAccumulator,
    _nucleotide_stats,
    _quantile,
)
from pheniqs_tpu.phred import EFFECTIVE_PHRED_RANGE


def serial_reference(codes, quals, lengths):
    """Per-read serial oracle following the C++ exactly."""
    capacity = 0
    shortest = None
    code_count = np.zeros(IUPAC_CODE_SIZE, dtype=np.int64)
    histogram = {}
    avg = {"count": 0, "sum": 0.0, "min": 0.0, "max": 0.0}
    avg_dist = np.zeros(EFFECTIVE_PHRED_RANGE, dtype=np.int64)
    for code, qual, length in zip(codes, quals, lengths):
        capacity = max(capacity, length)
        shortest = length if shortest is None else min(shortest, length)
        value = 0.0
        for i in range(length):
            code_count[0] += 1
            code_count[code[i]] += 1
            key = (i, int(code[i]))
            histogram.setdefault(key, np.zeros(EFFECTIVE_PHRED_RANGE, np.int64))
            histogram[key][qual[i]] += 1
            value += qual[i]
        value /= length
        avg["count"] += 1
        avg["sum"] += value
        avg["min"] = min(avg["min"], value)
        avg["max"] = max(avg["max"], value)
        avg_dist[int(value)] += 1
    return capacity, shortest, code_count, histogram, avg, avg_dist


def test_segment_accumulator_matches_serial():
    rng = np.random.default_rng(5)
    n, w = 400, 24
    codes = rng.choice([1, 2, 4, 8, 15], size=(n, w)).astype(np.uint8)
    quals = rng.integers(2, 41, size=(n, w)).astype(np.uint8)
    lengths = rng.integers(10, w + 1, size=n).astype(np.int32)

    accumulator = SegmentQualityAccumulator()
    # split into two batches to exercise growth + merge-by-accumulation
    accumulator.increment_batch(codes[:150], quals[:150], lengths[:150])
    accumulator.increment_batch(codes[150:], quals[150:], lengths[150:])

    capacity, shortest, code_count, histogram, avg, avg_dist = serial_reference(
        codes, quals, lengths
    )
    assert accumulator.capacity == capacity
    assert accumulator.shortest == shortest
    np.testing.assert_array_equal(accumulator.code_count, code_count)
    for (cycle, code), dist in histogram.items():
        np.testing.assert_array_equal(accumulator.histogram[cycle, code], dist)
    assert accumulator.average_count == avg["count"]
    np.testing.assert_allclose(accumulator.average_sum, avg["sum"])
    assert accumulator.average_min == avg["min"]
    np.testing.assert_allclose(accumulator.average_max, avg["max"])
    np.testing.assert_array_equal(accumulator.average_distribution, avg_dist)

    report = accumulator.encode()
    assert report["max sequence length"] == capacity
    assert report["min sequence length"] == shortest
    total_by_cycle = report["quality control by cycle"][
        "cycle quality distribution"
    ]["cycle count"]
    assert sum(total_by_cycle) == int(code_count[0])


def test_quantile_reference_semantics():
    # quirky scan: position = int(portion * count), walk until bucket >= position
    dist = np.zeros(EFFECTIVE_PHRED_RANGE, dtype=np.int64)
    dist[10] = 4
    dist[20] = 4
    dist[30] = 2
    count = int(dist.sum())
    assert _quantile(dist, count, 0.5) == 20
    assert _quantile(dist, count, 0.25) == 10
    assert _quantile(dist, count, 0.75) == 20
    stats = _nucleotide_stats(dist)
    assert stats["min"] == 10 and stats["max"] == 30
    assert stats["IQR"] == stats["Q3"] - stats["Q1"]
    assert stats["LW"] >= stats["min"] and stats["RW"] <= stats["max"]


def test_merge_equals_single_pass():
    rng = np.random.default_rng(9)
    codes = rng.choice([1, 2, 4, 8], size=(100, 12)).astype(np.uint8)
    quals = rng.integers(2, 41, size=(100, 12)).astype(np.uint8)
    lengths = np.full(100, 12, dtype=np.int32)

    whole = SegmentQualityAccumulator()
    whole.increment_batch(codes, quals, lengths)

    left = SegmentQualityAccumulator()
    left.increment_batch(codes[:37], quals[:37], lengths[:37])
    right = SegmentQualityAccumulator()
    right.increment_batch(codes[37:], quals[37:], lengths[37:])
    left.merge(right)

    np.testing.assert_array_equal(left.histogram, whole.histogram)
    np.testing.assert_array_equal(left.code_count, whole.code_count)
    assert left.encode() == whole.encode()
