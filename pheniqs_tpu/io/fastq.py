"""FASTQ stream reader/writer.

Parses 4-line FASTQ records (plain, gzip or bgzf compressed), decodes
Illumina-style comments for segment index / filter flag / control number /
barcode (reference fastq.h:104-332), and assembles multi-segment reads from
either one interleaved feed or several parallel feeds with arbitrary
per-feed resolution.

A pure-Python/NumPy implementation used by the strict engine and tests; the
high-throughput native ingest lives in host/ and exposes the same record
interface.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass

from ..errors import IOError_, SequenceError


@dataclass
class FastqRecord:
    name: bytes
    comment: bytes
    sequence: bytes  # ASCII nucleotides
    quality: bytes  # phred values (offset already removed)
    segment_index: int = 1
    qcfail: bool = False
    control: int = 0
    barcode: bytes = b""


def _parse_illumina_comment(record: FastqRecord) -> None:
    """Extract segment index, filter flag, control and barcode from an
    Illumina comment of the form `1:N:0:CGATGT`."""
    fields = record.comment.split(b":", 3)
    if len(fields) > 0 and fields[0].isdigit():
        record.segment_index = int(fields[0])
    if len(fields) > 1 and len(fields[1]) == 1:
        record.qcfail = fields[1] == b"Y"
    if len(fields) > 2 and fields[2].isdigit():
        record.control = int(fields[2])
    if len(fields) > 3:
        record.barcode = fields[3].split(b" ", 1)[0]


def open_maybe_compressed(path: str, mode: str = "rb"):
    if path in ("-", "/dev/stdin"):
        return io.BufferedReader(os.fdopen(os.dup(0), "rb"), buffer_size=1 << 20)
    raw = open(path, "rb", buffering=1 << 20)
    magic = raw.peek(2)[:2]
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=raw), buffer_size=1 << 20)
    return raw


def read_fastq(path: str, phred_offset: int = 33):
    """Yield FastqRecord objects from a (possibly compressed) FASTQ file."""
    stream = open_maybe_compressed(path)
    try:
        while True:
            header = stream.readline()
            if not header:
                return
            header = header.rstrip(b"\r\n")
            if not header:
                continue
            if not header.startswith(b"@"):
                raise SequenceError(f"corrupt FASTQ header in {path}: {header[:64]!r}")
            sequence = stream.readline().rstrip(b"\r\n")
            separator = stream.readline()
            if not separator.startswith(b"+"):
                raise SequenceError(f"corrupt FASTQ separator in {path}")
            quality_ascii = stream.readline().rstrip(b"\r\n")
            if len(quality_ascii) != len(sequence):
                raise SequenceError(
                    f"sequence/quality length mismatch in {path} for {header[:64]!r}"
                )
            space = header.find(b" ")
            if space < 0:
                name, comment = header[1:], b""
            else:
                name, comment = header[1:space], header[space + 1 :]
            record = FastqRecord(
                name=name,
                comment=comment,
                sequence=sequence,
                # clamp to the classification quality domain [0, 0x80),
                # matching the native parser: a byte below the offset
                # would otherwise raise from bytes() (negative), and
                # binary garbage above it would index the 0x80-sized
                # substitution LUT out of bounds
                quality=bytes(
                    min(max(q - phred_offset, 0), 0x7F)
                    for q in quality_ascii
                ),
            )
            if comment:
                _parse_illumina_comment(record)
            yield record
    finally:
        stream.close()


class FastqReadAssembler:
    """Assemble multi-segment reads from one or more FASTQ feeds.

    `feeds` is a list of (path, resolution) pairs; resolution is the number
    of consecutive records in that feed belonging to one read. The total
    input segment cardinality is the sum of resolutions, and feeds
    contribute their segments in feed order (reference proxy.h:44-88,
    transcode.cpp:559-682).
    """

    def __init__(
        self,
        feeds: list[tuple[str, int]],
        phred_offset: int = 33,
        sensed: bool = False,
    ):
        self.feeds = feeds
        self.phred_offset = phred_offset
        self.sensed = sensed

    def _layout_hint(self) -> str:
        layout = ", ".join(
            f"{path}: {resolution}" for path, resolution in self.feeds
        )
        hint = f" (feed resolution: {layout})"
        if self.sensed:
            hint += (
                "; the layout was sensed from the head of each feed and may"
                " be wrong for this input — declare the input layout"
                " explicitly (repeat the url in `input` once per interleaved"
                " segment) to override sensing"
            )
        return hint

    def __iter__(self):
        iterators = [read_fastq(path, self.phred_offset) for path, _ in self.feeds]
        resolutions = [resolution for _, resolution in self.feeds]
        while True:
            read: list[FastqRecord] = []
            exhausted = 0
            for iterator, resolution in zip(iterators, resolutions):
                for _ in range(resolution):
                    record = next(iterator, None)
                    if record is None:
                        exhausted += 1
                        break
                    read.append(record)
            if exhausted:
                if read:
                    raise IOError_(
                        "truncated input: feeds ended out of sync"
                        + self._layout_hint()
                    )
                return
            baseline = read[0].name
            for record in read[1:]:
                if record.name != baseline:
                    raise SequenceError(
                        f"read out of sync {record.name.decode()} and "
                        f"{baseline.decode()}" + self._layout_hint()
                    )
            yield read


def sense_resolution(path: str, phred_offset: int = 33, probe: int = 32) -> int:
    """Count consecutive records sharing a read id at the head of the feed
    (reference transcode.cpp:559-682 input sensing)."""
    resolution = 0
    first_name = None
    for i, record in enumerate(read_fastq(path, phred_offset)):
        if i >= probe:
            break
        if first_name is None:
            first_name = record.name
            resolution = 1
        elif record.name == first_name:
            resolution += 1
        else:
            break
    return max(resolution, 1)


def write_fastq_record(
    buffer: bytearray,
    name: bytes,
    comment: bytes,
    sequence_ascii: bytes,
    quality_phred: bytes,
    phred_offset: int = 33,
) -> None:
    buffer += b"@" + name
    if comment:
        buffer += b" " + comment
    buffer += b"\n" + sequence_ascii + b"\n+\n"
    buffer += bytes(q + phred_offset for q in quality_phred)
    buffer += b"\n"
