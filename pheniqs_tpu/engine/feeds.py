"""Output feeds and channels (reference multiplex.h:184-232, hts.h,
fastq.h:144-198): format-aware emission — SAM text, BAM containers,
FASTQ with reconstructed Illumina comments — and per-barcode routing.
"""

from __future__ import annotations

import sys

from ..config.url import URL
from ..io.sam import (
    FLAG_QCFAIL,
    bam_codes_to_ascii,
    format_record,
    quality_to_ascii,
)


class OutputFeed:
    """One output destination shared by all channels referencing its URL.

    Emission is format-aware (reference hts.h:42-299, fastq.h:144-178):
    SAM text, BAM (BGZF container), CRAM 3.0 containers, or FASTQ with
    the reconstructed Illumina comment.
    """

    def __init__(self, proxy: dict, ontology: dict):
        self.url = URL(proxy["url"])
        self.phred_offset = int(proxy.get("phred offset", 33))
        self.format = self.url.format_type or "sam"
        self.platform = str(ontology.get("platform", "ILLUMINA"))
        self.compression_threads = int(ontology.get("htslib threads", 1) or 1)
        self.stream = None
        self._owns_stream = False
        self._raw = None
        self.bam = None
        self.header: bytes = b""

    def initiate(self, header: "SamHeader | None"):
        if self.url.is_stdout():
            self.stream = sys.stdout.buffer
        elif self.url.is_stderr():
            self.stream = sys.stderr.buffer
        elif self.url.is_dev_null():
            self.stream = None
        else:
            compression = self.url.compression
            if self.format != "bam" and compression in ("gz", "bgzf"):
                from ..io.hts import BgzfWriter

                # BGZF is valid gzip; htslib writes .gz text feeds the same
                # way, and the block pool parallelizes compression
                level = int(self.url.compression_level or 5)
                self._raw = open(self.url.path, "wb")
                self.stream = BgzfWriter(
                    self._raw, level, threads=self.compression_threads
                )
            else:
                self.stream = open(self.url.path, "wb")
            self._owns_stream = True
        if self.stream is not None:
            if self.format == "sam" and header is not None:
                self.stream.write(header.encode())
                # a compressing stream buffers: force the header block out
                # NOW so worker-rendered chunks appended raw by write_raw
                # land after it, not before
                flush_block = getattr(self.stream, "flush_block", None)
                if flush_block is not None:
                    flush_block()
            elif self.format == "bam":
                from ..io.hts import BamWriter

                level = int(self.url.compression_level or 5)
                self.bam = BamWriter(
                    self.stream,
                    header.encode().decode() if header is not None else "",
                    level,
                    threads=self.compression_threads,
                )
                # same ordering rule: the BGZF-buffered BAM header must
                # reach the file before any worker chunk
                self.bam.bgzf.flush_block()
            elif self.format == "cram":
                from ..io.cram import CramWriter

                level = int(self.url.compression_level or 5)
                self.bam = CramWriter(
                    self.stream,
                    header.encode().decode() if header is not None else "",
                    level,
                    threads=self.compression_threads,
                )

    def write(self, payload: bytes):
        if self.stream is not None:
            self.stream.write(payload)

    def write_raw(self, payload: bytes):
        """Write bytes already in this feed's on-disk encoding (worker-
        rendered BGZF blocks or text), bypassing any parent-side
        compressor so the payload is not compressed twice. CRAM worker
        chunks are pickled pre-compressed slice parts: the parent's
        CramWriter stamps them with the file's sequential record counter
        (io/cram.py CramPartBuilder)."""
        if self.format == "cram":
            if self.bam is not None and len(payload):
                import pickle

                if not isinstance(payload, (bytes, bytearray, memoryview)):
                    payload = bytes(payload)
                self.bam.emit_parts(pickle.loads(payload))
            return
        if self._raw is not None:
            self._raw.write(payload)
        elif self.stream is not None:
            self.stream.write(payload)

    def write_records(self, payload):
        """Write a pre-formatted record arena in this feed's RECORD
        encoding: SAM/FASTQ text goes to the (possibly compressing)
        stream; BAM record streams route through the container's BGZF
        compressor (the columnar render path)."""
        if self.stream is None:
            return
        if self.format == "bam" and self.bam is not None:
            self.bam.bgzf.write(payload)
        else:
            self.stream.write(payload)

    def emit(self, name, flag, code, quality, length, tags, segment_index):
        """Write one output segment in this feed's format."""
        if self.stream is None:
            return
        if self.format in ("bam", "cram"):
            self.bam.write_record(name, flag, code, quality, length, tags)
            return
        if self.format == "fastq":
            buffer = bytearray()
            buffer += b"@" + name.encode()
            if self.platform in ("ILLUMINA", "ELEMENT"):
                # reconstructed Illumina comment (reference fastq.h:180-198)
                fail = "Y" if flag & FLAG_QCFAIL else "N"
                buffer += f" {segment_index + 1}:{fail}:0:{tags.BC}".encode()
            buffer += b"\n"
            buffer += bam_codes_to_ascii(code, length).encode()
            buffer += b"\n+\n"
            buffer += quality_to_ascii(
                quality, length, self.phred_offset
            ).encode()
            buffer += b"\n"
            self.stream.write(bytes(buffer))
            return
        seq = bam_codes_to_ascii(code, length)
        qual = quality_to_ascii(quality, length, self.phred_offset)
        self.stream.write((format_record(name, flag, seq, qual, tags) + "\n").encode())

    def close(self):
        if self.bam is not None:
            self.bam.close()
            self.bam = None
        if self.stream is not None:
            self.stream.flush()
            if self._owns_stream:
                self.stream.close()
            if self._raw is not None:
                self._raw.close()
                self._raw = None
            self.stream = None


class Channel:
    """Per-barcode output routing (reference multiplex.h:184-232)."""

    def __init__(self, index: int, ontology: dict, feeds_by_url: dict):
        self.index = index
        self.filter_outgoing_qc_fail = bool(
            ontology.get("filter outgoing qc fail", False)
        )
        self.output_urls = list(ontology.get("output", []))
        self.feeds = [feeds_by_url[url] for url in self.output_urls]


