"""Structure-of-arrays read batches.

A ReadBatch is the unit of work flowing through the engine: N reads, each
with S segments, stored as padded uint8 code/quality matrices plus length
vectors — the host-side mirror of the tensors shipped to the device.
Variable-length metadata (names) stays on host.

This replaces the reference's per-read `Read`/`Segment` object graph
(reference read.h:28-378) with a layout the TPU can consume directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..transform import SegmentBatch


@dataclass
class ReadBatch:
    segments: list[SegmentBatch]
    names: list[bytes]
    qcfail: np.ndarray  # (N,) bool - incoming QC fail flag

    @property
    def size(self) -> int:
        return len(self.names)

    @property
    def segment_cardinality(self) -> int:
        return len(self.segments)

    def select(self, mask: np.ndarray) -> "ReadBatch":
        """Subset the batch by boolean mask, preserving order."""
        idx = np.flatnonzero(mask)
        return ReadBatch(
            segments=[
                SegmentBatch(
                    code=s.code[idx],
                    quality=s.quality[idx],
                    length=s.length[idx],
                )
                for s in self.segments
            ],
            names=[self.names[i] for i in idx],
            qcfail=self.qcfail[idx],
        )

    @classmethod
    def from_records(
        cls, records: list[list[tuple[bytes, bytes, bytes, bool]]]
    ) -> "ReadBatch":
        """Build from per-read lists of (name, sequence_ascii, quality_phred,
        qcfail) tuples, one inner list entry per segment."""
        from ..iupac import ASCII_TO_BAM

        n = len(records)
        cardinality = len(records[0]) if n else 0
        segments = []
        for s in range(cardinality):
            lengths = np.array([len(r[s][1]) for r in records], dtype=np.int32)
            width = int(lengths.max(initial=0))
            code = np.zeros((n, width), dtype=np.uint8)
            qual = np.zeros((n, width), dtype=np.uint8)
            for i, r in enumerate(records):
                seq = np.frombuffer(r[s][1], dtype=np.uint8)
                code[i, : len(seq)] = ASCII_TO_BAM[seq]
                qual[i, : len(seq)] = np.frombuffer(r[s][2], dtype=np.uint8)
            segments.append(SegmentBatch(code=code, quality=qual, length=lengths))
        names = [r[0][0] for r in records]
        qcfail = np.array([any(seg[3] for seg in r) for r in records], dtype=bool)
        return cls(segments=segments, names=names, qcfail=qcfail)
