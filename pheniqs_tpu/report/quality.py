"""Per-channel quality-control accumulators (`--quality`).

Replicates the reference's QC tracking (reference multiplex.h:28-182,
multiplex.cpp:25-295): per output segment, a per-cycle per-nucleotide
phred histogram with quartile/whisker statistics, nucleotide counts, and
an average-phred-per-read distribution. Updates are vectorized over
batches with bincount; every field is a sum, so accumulators merge across
chips/hosts with elementwise addition (the allreduce analog of
``Channel::operator+=``).

Reference quirks reproduced deliberately:
  * ``average phred score min`` is initialized to 0 and only ever lowered
    (multiplex.cpp:27), so it reports 0.0 on any real data;
  * the quantile scan (multiplex.h:94-107) truncates ``portion * count``
    to an integer and walks the histogram — not a standard quantile
    definition;
  * whiskers truncate ``Q1 - 1.5*IQR`` / ``Q3 + 1.5*IQR`` to integers
    before clamping (multiplex.cpp:95-101).
"""

from __future__ import annotations

import numpy as np

from ..phred import EFFECTIVE_PHRED_RANGE
from ..iupac import BAM_TO_ASCII_STR

IUPAC_CODE_SIZE = 16


def _quantile(distribution: np.ndarray, count: int, portion: float) -> int:
    """Reference NucleotideAccumulator::quantile (multiplex.h:94-107)."""
    position = int(portion * count)
    phred = 0
    size = distribution.shape[0]
    while position > 0:
        if phred >= size:
            break
        if distribution[phred] >= position:
            break
        position -= int(distribution[phred])
        phred += 1
        while phred < size and distribution[phred] == 0:
            phred += 1
    return phred


def _nucleotide_stats(distribution: np.ndarray) -> dict:
    """Reference NucleotideAccumulator::finalize (multiplex.cpp:76-101)."""
    count = int(distribution.sum())
    stats = {
        "count": count, "min": 0, "max": 0, "mean": 0.0, "median": 0,
        "Q1": 0, "Q3": 0, "IQR": 0, "LW": 0, "RW": 0,
    }
    if count == 0:
        return stats
    nonzero = np.flatnonzero(distribution)
    stats["min"] = int(nonzero[0])
    stats["max"] = int(nonzero[-1])
    total = int((distribution * np.arange(distribution.shape[0])).sum())
    stats["mean"] = total / count
    stats["median"] = _quantile(distribution, count, 0.5)
    q1 = _quantile(distribution, count, 0.25)
    q3 = _quantile(distribution, count, 0.75)
    stats["Q1"] = q1
    stats["Q3"] = q3
    iqr = q3 - q1
    stats["IQR"] = iqr
    lw = int(q1 - iqr * 1.5)
    stats["LW"] = stats["min"] if lw < stats["min"] else lw
    rw = int(q3 + iqr * 1.5)
    stats["RW"] = stats["max"] if rw > stats["max"] else rw
    return stats


class SegmentQualityAccumulator:
    """Reference SegmentAccumulator, vectorized (multiplex.h:131-164)."""

    def __init__(self):
        self.capacity = 0
        self.shortest: int | None = None
        self.code_count = np.zeros(IUPAC_CODE_SIZE, dtype=np.int64)
        # (cycle, code, phred) histogram; grows along the cycle axis
        self.histogram = np.zeros(
            (0, IUPAC_CODE_SIZE, EFFECTIVE_PHRED_RANGE), dtype=np.int64
        )
        self.average_count = 0
        self.average_sum = 0.0
        self.average_min = 0.0  # reference starts at 0 and only lowers
        self.average_max = 0.0
        self.average_distribution = np.zeros(EFFECTIVE_PHRED_RANGE, dtype=np.int64)

    def _grow(self, cycles: int):
        if cycles > self.capacity:
            grown = np.zeros(
                (cycles, IUPAC_CODE_SIZE, EFFECTIVE_PHRED_RANGE), dtype=np.int64
            )
            grown[: self.capacity] = self.histogram
            self.histogram = grown
            self.capacity = cycles

    def increment_batch(
        self, code: np.ndarray, quality: np.ndarray, length: np.ndarray
    ):
        n, w = code.shape
        if n == 0:
            return
        wmax = int(length.max(initial=0))
        self._grow(wmax)
        shortest = int(length.min())
        self.shortest = (
            shortest if self.shortest is None else min(self.shortest, shortest)
        )
        mask = np.arange(w, dtype=np.int64)[None, :] < length[:, None]
        in_code = code.astype(np.int64)
        in_qual = np.clip(
            quality.astype(np.int64), 0, EFFECTIVE_PHRED_RANGE - 1
        )
        # slot 0 counts every base (NO_NUCLEOTIDE total, multiplex.h:152),
        # and '=' (code 0) additionally lands there
        self.code_count[0] += int(mask.sum())
        counts = np.bincount(in_code[mask], minlength=IUPAC_CODE_SIZE)
        self.code_count[1:] += counts[1:]
        self.code_count[0] += counts[0]  # '=' double-counts into slot 0

        cycles = np.broadcast_to(np.arange(w, dtype=np.int64)[None, :], (n, w))
        flat = (
            cycles[mask] * IUPAC_CODE_SIZE + in_code[mask]
        ) * EFFECTIVE_PHRED_RANGE + in_qual[mask]
        histogram = np.bincount(
            flat, minlength=wmax * IUPAC_CODE_SIZE * EFFECTIVE_PHRED_RANGE
        ).reshape(wmax, IUPAC_CODE_SIZE, EFFECTIVE_PHRED_RANGE)
        self.histogram[:wmax] += histogram

        # average phred per read (reference multiplex.h:45-55)
        with np.errstate(divide="ignore", invalid="ignore"):
            sums = (quality.astype(np.float64) * mask).sum(axis=1)
            values = np.where(length > 0, sums / np.maximum(length, 1), 0.0)
        self.average_count += n
        self.average_sum += float(values.sum())
        self.average_min = min(self.average_min, float(values.min(initial=0.0)))
        self.average_max = max(self.average_max, float(values.max(initial=0.0)))
        self.average_distribution += np.bincount(
            np.clip(values.astype(np.int64), 0, EFFECTIVE_PHRED_RANGE - 1),
            minlength=EFFECTIVE_PHRED_RANGE,
        )

    def merge(self, other: "SegmentQualityAccumulator"):
        self._grow(other.capacity)
        self.histogram[: other.capacity] += other.histogram
        self.code_count += other.code_count
        if other.shortest is not None:
            self.shortest = (
                other.shortest
                if self.shortest is None
                else min(self.shortest, other.shortest)
            )
        self.average_count += other.average_count
        self.average_sum += other.average_sum
        self.average_min = min(self.average_min, other.average_min)
        self.average_max = max(self.average_max, other.average_max)
        self.average_distribution += other.average_distribution

    def state_dict(self) -> dict:
        """JSON-safe raw state for the PHENIQS_SHARD merge workflow."""
        return {
            "capacity": self.capacity,
            "shortest": self.shortest,
            "code_count": self.code_count.tolist(),
            "histogram": self.histogram.reshape(-1).tolist(),
            "average_count": self.average_count,
            "average_sum": self.average_sum,
            "average_min": self.average_min,
            "average_max": self.average_max,
            "average_distribution": self.average_distribution.tolist(),
        }

    def merge_state(self, state: dict):
        other = SegmentQualityAccumulator()
        other.capacity = int(state["capacity"])
        other.shortest = state["shortest"]
        other.code_count = np.asarray(state["code_count"], dtype=np.int64)
        other.histogram = np.asarray(state["histogram"], dtype=np.int64).reshape(
            other.capacity, IUPAC_CODE_SIZE, EFFECTIVE_PHRED_RANGE
        )
        other.average_count = int(state["average_count"])
        other.average_sum = float(state["average_sum"])
        other.average_min = float(state["average_min"])
        other.average_max = float(state["average_max"])
        other.average_distribution = np.asarray(
            state["average_distribution"], dtype=np.int64
        )
        self.merge(other)

    def encode(self) -> dict:
        """Reference encode_value(SegmentAccumulator) (multiplex.cpp:194-263)."""
        report: dict = {
            "min sequence length": self.shortest if self.shortest is not None else 0,
            "max sequence length": self.capacity,
        }
        # per-cycle distributions; code 0 aggregates every nucleotide
        aggregate = self.histogram.sum(axis=1)  # (cycle, phred)

        def cycle_block(per_cycle: np.ndarray) -> dict:
            stats = [_nucleotide_stats(per_cycle[c]) for c in range(self.capacity)]
            return {
                "cycle count": [s["count"] for s in stats],
                "cycle quality first quartile": [s["Q1"] for s in stats],
                "cycle quality third quartile": [s["Q3"] for s in stats],
                "cycle quality interquartile range": [s["IQR"] for s in stats],
                "cycle quality left whisker": [s["LW"] for s in stats],
                "cycle quality right whisker": [s["RW"] for s in stats],
                "cycle quality min": [s["min"] for s in stats],
                "cycle quality max": [s["max"] for s in stats],
                "cycle quality mean": [s["mean"] for s in stats],
                "cycle quality median": [s["median"] for s in stats],
            }

        by_nucleotide = []
        for code in range(1, IUPAC_CODE_SIZE):
            if self.code_count[code] > 0:
                by_nucleotide.append(
                    {
                        "nucleotide count": int(self.code_count[code]),
                        "nucleotide": BAM_TO_ASCII_STR[code],
                        "cycle quality distribution": cycle_block(
                            self.histogram[:, code, :]
                        ),
                    }
                )
        report["quality control by nucleotide"] = by_nucleotide
        by_cycle: dict = {}
        if self.code_count[0] > 0:
            by_cycle["cycle quality distribution"] = cycle_block(aggregate)
        report["quality control by cycle"] = by_cycle

        report["average phred score report"] = {
            "average phred score min": self.average_min,
            "average phred score max": self.average_max,
            "average phred score mean": (
                self.average_sum / self.average_count
                if self.average_count > 0
                else 0.0
            ),
            "average phred score distribution": [
                int(v) for v in self.average_distribution
            ],
        }
        return report


class ChannelQualityAccumulator:
    """Reference ReadAccumulator: one SegmentQualityAccumulator per output
    segment (multiplex.h:167-182)."""

    def __init__(self, segment_cardinality: int):
        self.segments = [
            SegmentQualityAccumulator() for _ in range(segment_cardinality)
        ]

    def increment_batch(self, output_segments, mask: np.ndarray):
        if not mask.any():
            return
        for accumulator, segment in zip(self.segments, output_segments):
            accumulator.increment_batch(
                segment.code[mask], segment.quality[mask], segment.length[mask]
            )

    def merge(self, other: "ChannelQualityAccumulator"):
        for mine, theirs in zip(self.segments, other.segments):
            mine.merge(theirs)

    def state_dict(self) -> dict:
        return {"segments": [s.state_dict() for s in self.segments]}

    def merge_state(self, state: dict):
        states = state["segments"]
        if len(states) != len(self.segments):
            raise ValueError(
                f"partial quality segment cardinality {len(states)} != "
                f"{len(self.segments)}"
            )
        for mine, theirs in zip(self.segments, states):
            mine.merge_state(theirs)

    def encode(self) -> dict:
        return {
            "quality control by segment": [
                segment.encode() for segment in self.segments
            ]
        }
