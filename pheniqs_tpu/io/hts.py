"""HTS container formats: BGZF, BAM read/write, SAM text input.

Pure-Python/NumPy implementations of the formats the reference reaches
through htslib (reference hts.h:42-299): BGZF block compression (gzip
members with the BC extra field + the 28-byte EOF marker), the BAM binary
record codec (4-bit packed sequence, typed aux block), and SAM text
parsing. CRAM 3.0 lives in the sibling ``cram`` module and plugs in via
``hts_record_reader``.

Reads produced by this framework are unaligned: refID/pos are -1, mapq 0,
no CIGAR, bin fixed at 4680 (reg2bin of an unplaced interval).
"""

from __future__ import annotations

import gzip
import struct
import zlib

import numpy as np

from ..errors import IOError_, SequenceError
from ..iupac import ASCII_TO_BAM

#: BGZF EOF marker block (empty payload), per the SAM spec
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

#: max uncompressed payload per BGZF block
BGZF_BLOCK = 0xFF00

UNMAPPED_BIN = 4680

#: CIGAR ops that consume reference bases (SAM spec table in section 1.4)
_REF_CONSUMING_OPS = frozenset("MDN=X")


def reg2bin(beg: int, end: int) -> int:
    """SAM spec section 5.3: the smallest UCSC binning-scheme bin fully
    containing the zero-based half-open interval [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _deflate_block(payload: bytes, level: int) -> bytes:
    """Compress one payload into a complete standalone BGZF block."""
    deflater = zlib.compressobj(
        level, zlib.DEFLATED, -15, zlib.DEF_MEM_LEVEL, 0
    )
    body = deflater.compress(payload) + deflater.flush()
    bsize = len(body) + 25 + 1  # header(12) + XLEN block(6) + body + crc+isize(8)
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 8, 4,  # gzip magic, deflate, FEXTRA
        0, 0, 0xFF,        # mtime, xfl, os
        6,                 # XLEN
        0x42, 0x43, 2,     # 'B' 'C', subfield length
        bsize - 1,
    )
    trailer = struct.pack("<II", zlib.crc32(payload), len(payload))
    return header + body + trailer


class BgzfWriter:
    """Block-gzip writer over a binary stream.

    With ``threads > 1`` block compression runs on a thread pool (zlib
    releases the GIL) while blocks stream out strictly in order — the
    analog of htslib's compression thread pool (reference
    transcode.cpp:1599-1605, `--htslib-threads`)."""

    def __init__(self, stream, level: int = 5, threads: int = 1):
        self.stream = stream
        self.level = level
        self.buffer = bytearray()
        self._pool = None
        self._pending = None
        if threads > 1:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=threads)
            self._pending = deque()
            self._max_pending = threads * 4

    def write(self, data):
        if not isinstance(data, (bytes, bytearray, memoryview)):
            data = memoryview(data)  # uint8 render views
        self.buffer += data
        while len(self.buffer) >= BGZF_BLOCK:
            self._emit(bytes(self.buffer[:BGZF_BLOCK]))
            del self.buffer[:BGZF_BLOCK]

    def _emit(self, payload: bytes):
        if self._pool is None:
            self.stream.write(_deflate_block(payload, self.level))
            return
        self._pending.append(
            self._pool.submit(_deflate_block, payload, self.level)
        )
        # drain completed prefix; block when too far ahead
        while self._pending and (
            self._pending[0].done() or len(self._pending) > self._max_pending
        ):
            self.stream.write(self._pending.popleft().result())

    def _drain(self):
        if self._pending:
            while self._pending:
                self.stream.write(self._pending.popleft().result())

    def flush_block(self):
        """Emit pending payload as a complete BGZF block immediately."""
        if self.buffer:
            self._emit(bytes(self.buffer))
            self.buffer.clear()
        self._drain()

    def flush(self):
        pass  # blocks flush on close; partial flushes would fragment blocks

    def close(self):
        self.flush_block()
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None
        self.stream.write(BGZF_EOF)
        self.stream.flush()


#: BAM cigar op characters in numeric order
CIGAR_OPS = "MIDNSHP=X"


class BamWriter:
    """BAM emitter: unaligned classified reads (write_record) plus full
    alignment records for transcoding (write_hts_record); ``references``
    fills the binary reference dictionary to match the header's @SQ."""

    def __init__(self, stream, header_text: str, level: int = 5, threads: int = 1,
                 references: list | None = None):
        self.bgzf = BgzfWriter(stream, level, threads)
        text = header_text.encode()
        self.bgzf.write(b"BAM\x01")
        self.bgzf.write(struct.pack("<i", len(text)))
        self.bgzf.write(text)
        references = references or []
        self.bgzf.write(struct.pack("<i", len(references)))
        for ref_name, ref_length in references:
            raw = ref_name.encode() + b"\x00"
            self.bgzf.write(struct.pack("<i", len(raw)) + raw)
            self.bgzf.write(struct.pack("<i", int(ref_length)))

    def write_hts_record(self, record):
        """Emit a full HtsRecord, preserving alignment placement."""
        raw_name = bytes(record.name) + b"\x00"
        l_seq = int(record.code.shape[0])
        if l_seq:
            padded = np.zeros(l_seq + (l_seq & 1), dtype=np.uint8)
            padded[:l_seq] = np.asarray(record.code, dtype=np.uint8) & 0xF
            packed = ((padded[0::2] << 4) | padded[1::2]).tobytes()
            qual = np.asarray(record.quality, dtype=np.uint8).tobytes()
        else:
            packed = b""
            qual = b""
        cigar = record.cigar or []
        packed_cigar = b"".join(
            struct.pack("<I", (length << 4) | CIGAR_OPS.index(op))
            for op, length in cigar
        )
        if record.ref_id >= 0 and record.pos >= 0 and not (record.flag & 4):
            # mapped: bin must be reg2bin of the reference span (SAM spec
            # section 4.2.1; indexers and validators check it)
            span = sum(
                length
                for op, length in cigar
                if op in _REF_CONSUMING_OPS
            )
            record_bin = reg2bin(record.pos, record.pos + max(span, 1))
        else:
            record_bin = UNMAPPED_BIN
        body = (
            struct.pack(
                "<iiBBHHHiiii",
                record.ref_id,
                record.pos,
                len(raw_name),
                record.mapq,
                record_bin,
                len(cigar),
                record.flag,
                l_seq,
                record.next_ref,
                record.next_pos,
                record.tlen,
            )
            + raw_name
            + packed_cigar
            + packed
            + qual
            + encode_hts_aux(record)
        )
        self.bgzf.write(struct.pack("<i", len(body)) + body)

    def write_record(
        self,
        name: str,
        flag: int,
        code: np.ndarray,
        quality: np.ndarray,
        length: int,
        tags,
    ):
        raw_name = name.encode() + b"\x00"
        l_seq = max(length, 0)
        if l_seq:
            padded = np.zeros(l_seq + (l_seq & 1), dtype=np.uint8)
            padded[:l_seq] = np.asarray(code[:l_seq], dtype=np.uint8) & 0xF
            packed = ((padded[0::2] << 4) | padded[1::2]).tobytes()
            qual = np.asarray(quality[:l_seq], dtype=np.uint8).tobytes()
        else:
            packed = b""
            qual = b""
        aux = encode_bam_aux(tags)
        body = (
            struct.pack(
                "<iiBBHHHiiii",
                -1,                      # refID
                -1,                      # pos
                len(raw_name),           # l_read_name
                0,                       # mapq
                UNMAPPED_BIN,            # bin
                0,                       # n_cigar
                flag,                    # flag
                l_seq,
                -1,                      # next_refID
                -1,                      # next_pos
                0,                       # tlen
            )
            + raw_name
            + packed
            + qual
            + aux
        )
        self.bgzf.write(struct.pack("<i", len(body)) + body)

    def close(self):
        self.bgzf.close()


def encode_aux_dict(aux: dict) -> bytes:
    """dict tag -> value (as _parse_bam_aux produces) back to a BAM aux
    block: int -> 'i', float -> 'f', str -> 'Z', None (array tags dropped
    at parse time) skipped. RG rides its own CRAM series so transcoders
    re-add it from the read group index."""
    out = bytearray()
    for tag, value in aux.items():
        if value is None:
            continue
        out.extend(tag.encode())
        if isinstance(value, bool):
            raise IOError_(f"aux tag {tag}: bool is not a BAM aux type")
        if isinstance(value, int):
            out.append(ord("i"))
            out.extend(struct.pack("<i", value))
        elif isinstance(value, float):
            out.append(ord("f"))
            out.extend(struct.pack("<f", np.float32(value)))
        else:
            out.append(ord("Z"))
            out.extend(str(value).encode())
            out.append(0)
    return bytes(out)


def encode_hts_aux(record) -> bytes:
    """The BAM aux block of an HtsRecord: the verbatim raw split when the
    record carries one (plus RG from the dict — RG rides a dedicated CRAM
    series, so transcoders re-add it here), else the dict re-encode."""
    if record.raw_tags is None:
        return encode_aux_dict(record.aux)
    out = bytearray()
    for key, value in record.raw_tags:
        out.extend(key)
        out.extend(value)
    rg = record.aux.get("RG")
    if rg is not None:
        out.extend(b"RGZ")
        out.extend(str(rg).encode())
        out.append(0)
    return bytes(out)


def read_bam_header(path: str):
    """(header_text, [(reference_name, reference_length)]) of a BAM."""
    from ..native import open_bgzf

    stream = open_bgzf(path)
    if stream is None:
        stream = gzip.open(path, "rb")
    try:
        if stream.read(4) != b"BAM\x01":
            raise IOError_(f"{path} is not a BAM file")
        (l_text,) = struct.unpack("<i", stream.read(4))
        header_text = stream.read(l_text).decode()
        (n_ref,) = struct.unpack("<i", stream.read(4))
        references = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", stream.read(4))
            raw = stream.read(l_name + 4)
            references.append(
                (
                    raw[: l_name - 1].decode(),
                    struct.unpack("<i", raw[l_name:])[0],
                )
            )
        return header_text, references
    finally:
        stream.close()


_PACK_I4 = struct.Struct("<i").pack
_PACK_F4 = struct.Struct("<f").pack


def split_bam_aux(tags, skip_rg: bool = False) -> list:
    """AuxTags -> pre-split [(key3, value_bytes)] in the fixed emission
    order (reference auxiliary.cpp:327-359) — the CRAM writer's native
    intake shape (CramWriter._split_aux passes lists through), so the
    per-record path skips the encode-to-bytes/re-split round trip that
    profiled as a third of its cost. ``skip_rg`` omits the RG tag (it
    rides CRAM's dedicated RG data series)."""
    out = []
    append = out.append
    pack_i = _PACK_I4
    pack_f = _PACK_F4
    if tags.TC > 2:
        if tags.FI > 0:
            append((b"FIi", pack_i(tags.FI)))
        append((b"TCi", pack_i(tags.TC)))
    v = tags.FS
    if v:
        append((b"FSZ", v.encode() + b"\x00"))
    if not skip_rg:
        v = tags.RG
        if v:
            append((b"RGZ", v.encode() + b"\x00"))
    v = tags.PU
    if v:
        append((b"PUZ", v.encode() + b"\x00"))
    v = tags.LB
    if v:
        append((b"LBZ", v.encode() + b"\x00"))
    v = tags.PG
    if v:
        append((b"PGZ", v.encode() + b"\x00"))
    v = tags.CO
    if v:
        append((b"COZ", v.encode() + b"\x00"))
    v = tags.BC
    if v:
        append((b"BCZ", v.encode() + b"\x00"))
    v = tags.QT
    if v:
        append((b"QTZ", v.encode() + b"\x00"))
    if tags.XB > 0:
        append((b"XBf", pack_f(tags.XB)))
    v = tags.RX
    if v:
        append((b"RXZ", v.encode() + b"\x00"))
    v = tags.QX
    if v:
        append((b"QXZ", v.encode() + b"\x00"))
    v = tags.OX
    if v:
        append((b"OXZ", v.encode() + b"\x00"))
    v = tags.BZ
    if v:
        append((b"BZZ", v.encode() + b"\x00"))
    v = tags.MI
    if v:
        append((b"MIZ", v.encode() + b"\x00"))
    if tags.XM > 0:
        append((b"XMf", pack_f(tags.XM)))
    v = tags.CB
    if v:
        append((b"CBZ", v.encode() + b"\x00"))
    v = tags.CR
    if v:
        append((b"CRZ", v.encode() + b"\x00"))
    v = tags.CY
    if v:
        append((b"CYZ", v.encode() + b"\x00"))
    if tags.XC > 0:
        append((b"XCf", pack_f(tags.XC)))
    if tags.XO > 0:
        append((b"XOf", pack_f(tags.XO)))
    if tags.EE > 0:
        append((b"EEf", pack_f(tags.EE)))
    return out


def encode_bam_aux(tags) -> bytes:
    """AuxTags -> BAM binary aux block, same order and presence rules as
    the SAM text emission (reference auxiliary.cpp:327-359). One table:
    the split form IS the wire form, so this is a join of
    ``split_bam_aux`` — keeping the 22-tag order/presence rules in a
    single place (verified element-wise against the previous standalone
    encoder over randomized AuxTags)."""
    return b"".join(
        key + value for key, value in split_bam_aux(tags, skip_rg=False)
    )


class HtsRecord:
    """One parsed SAM/BAM alignment record.

    Alignment placement (ref_id/pos/mapq/cigar/mate fields) is carried so
    mapped records survive BAM<->CRAM transcoding (reference
    hts.cpp:160-240 delegates this to htslib); the demux engines ignore
    these fields — demultiplexed reads are unaligned by definition."""

    __slots__ = (
        "name", "flag", "code", "quality", "aux",
        "ref_id", "pos", "mapq", "cigar",
        "next_ref", "next_pos", "tlen", "raw_tags",
    )

    def __init__(self, name, flag, code, quality, aux,
                 ref_id=-1, pos=-1, mapq=0, cigar=None,
                 next_ref=-1, next_pos=-1, tlen=0, raw_tags=None):
        self.name = name  # bytes
        self.flag = flag
        self.code = code  # np.uint8 BAM nibble codes
        self.quality = quality  # np.uint8 phred values
        self.aux = aux  # dict tag -> value
        self.ref_id = ref_id        # BAM reference index, -1 unmapped
        self.pos = pos              # 0-based leftmost position, -1 unmapped
        self.mapq = mapq
        self.cigar = cigar          # list[(op_char, length)] or None
        self.next_ref = next_ref
        self.next_pos = next_pos
        self.tlen = tlen
        # verbatim aux split [(key3, value_bytes)], RG excluded;
        # authoritative for re-encoding when present (the dict is lossy:
        # 'B' arrays, 'A' chars and small-int widths do not survive it)
        self.raw_tags = raw_tags

    @property
    def qcfail(self) -> bool:
        return bool(self.flag & 0x200)

    @property
    def total_segments(self) -> int:
        """Segment cardinality (reference hts.h / Segment::total_segments):
        TC aux when present, else 2 for paired, else 1."""
        tc = self.aux.get("TC")
        if tc:
            return int(tc)
        if self.flag & 0x1:
            return 2
        return 1


def _parse_bam_aux(buffer: bytes) -> tuple[dict, list]:
    """One walk over a raw BAM aux block -> (lookup dict, raw tag split).

    The dict carries decoded values for consumers that look tags up
    (RG/TC/BC…; 'B' array tags decode to None there). The raw split is
    [(key3, value_bytes)] with RG excluded and every value verbatim —
    original integer widths, 'A' vs 'Z' types, and 'B' arrays intact — so
    transcoders re-emit the block faithfully instead of re-deriving it
    from the lossy dict (the reference keeps the whole bam1_t blob,
    hts.h:42-299)."""
    aux = {}
    raw: list = []
    offset = 0
    size = len(buffer)
    while offset + 3 <= size:
        key = buffer[offset : offset + 3]
        tag = key[:2].decode()
        kind = chr(key[2])
        offset += 3
        if kind == "Z" or kind == "H":
            end = buffer.index(0, offset)
            aux[tag] = buffer[offset:end].decode()
            value = buffer[offset : end + 1]
            offset = end + 1
        elif kind == "A":
            aux[tag] = chr(buffer[offset])
            value = buffer[offset : offset + 1]
            offset += 1
        elif kind in "cC":
            aux[tag] = struct.unpack_from("<b" if kind == "c" else "<B", buffer, offset)[0]
            value = buffer[offset : offset + 1]
            offset += 1
        elif kind in "sS":
            aux[tag] = struct.unpack_from("<h" if kind == "s" else "<H", buffer, offset)[0]
            value = buffer[offset : offset + 2]
            offset += 2
        elif kind in "iI":
            aux[tag] = struct.unpack_from("<i" if kind == "i" else "<I", buffer, offset)[0]
            value = buffer[offset : offset + 4]
            offset += 4
        elif kind == "f":
            aux[tag] = struct.unpack_from("<f", buffer, offset)[0]
            value = buffer[offset : offset + 4]
            offset += 4
        elif kind == "B":
            sub = chr(buffer[offset])
            count = struct.unpack_from("<I", buffer, offset + 1)[0]
            widths = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
            width = widths.get(sub)
            if width is None:
                raise IOError_(f"unsupported BAM aux array subtype {sub}")
            value = buffer[offset : offset + 5 + width * count]
            offset += 5 + width * count
            aux[tag] = None  # array tags ride raw_tags, not the dict
        else:
            raise IOError_(f"unsupported BAM aux type {kind}")
        if tag != "RG":
            raw.append((bytes(key), bytes(value)))
    return aux, raw


#: BAM seq nibble -> code for the high/low halves, vectorized unpack tables
_HI = np.arange(256, dtype=np.uint8) >> 4
_LO = np.arange(256, dtype=np.uint8) & 0xF


def iter_bam_record_bodies(path: str):
    """Yield the raw body bytes of each BAM alignment record (everything
    after the 4-byte block_size), skipping the header and reference
    directory. Decompression runs on the native parallel BGZF block pool
    when the host library is built (the ingest analog of the reference's
    htslib thread pool, reference transcode.cpp:1599-1605); serial gzip
    otherwise (plain gzip handles BGZF members transparently)."""
    from ..native import open_bgzf

    stream = open_bgzf(path)
    if stream is None:
        stream = gzip.open(path, "rb")
    try:
        magic = stream.read(4)
        if magic != b"BAM\x01":
            raise IOError_(f"{path} is not a BAM file")
        (l_text,) = struct.unpack("<i", stream.read(4))
        stream.read(l_text)
        (n_ref,) = struct.unpack("<i", stream.read(4))
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", stream.read(4))
            stream.read(l_name + 4)
        # buffered record framing: per-record stream.read pairs cost ~2 us
        # each through the BGZF pool wrapper; reading 1 MB windows and
        # slicing bodies out of them halves the per-record overhead
        buffer = b""
        position = 0
        while True:
            while len(buffer) - position < 4:
                chunk = stream.read(1 << 20)
                if not chunk:
                    return  # EOF (a trailing partial length word included)
                buffer = buffer[position:] + chunk
                position = 0
            (block_size,) = struct.unpack_from("<i", buffer, position)
            # mirror the native reader's plausibility gate: a corrupt or
            # negative size must fail typed, not walk backwards or buffer
            # unbounded memory (fixed record prefix is 32 bytes)
            if block_size < 32 or block_size > 1 << 28:
                raise IOError_(
                    f"implausible BAM record size {block_size} in {path}"
                )
            while len(buffer) - position - 4 < block_size:
                chunk = stream.read(max(1 << 20, block_size))
                if not chunk:
                    raise IOError_(f"truncated BAM record in {path}")
                buffer = buffer[position:] + chunk
                position = 0
            yield buffer[position + 4 : position + 4 + block_size]
            position += 4 + block_size
    finally:
        stream.close()


def record_from_bam_body(body: bytes) -> HtsRecord:
    """Parse one raw BAM record body into an HtsRecord."""
    (
        ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag,
        l_seq, next_ref, next_pos, tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", body, 0)
    offset = 32
    name = body[offset : offset + l_read_name - 1]
    offset += l_read_name
    cigar = None
    if n_cigar:
        packed_cigar = struct.unpack_from(f"<{n_cigar}I", body, offset)
        cigar = [
            ("MIDNSHP=X"[op & 0xF], op >> 4) for op in packed_cigar
        ]
    offset += 4 * n_cigar
    packed = np.frombuffer(
        body, dtype=np.uint8, count=(l_seq + 1) // 2, offset=offset
    )
    code = np.empty(l_seq, dtype=np.uint8)
    code[0::2] = _HI[packed][: (l_seq + 1) // 2]
    code[1::2] = _LO[packed][: l_seq // 2]
    offset += (l_seq + 1) // 2
    # the BAM missing-quality sentinel (all bytes 0xFF) passes through
    # verbatim: transcoders re-emit it so BAM->CRAM->BAM preserves '*'
    # qualities (htslib keeps the sentinel the same way); rewriting to
    # zeros here would silently turn missing into phred 0
    quality = np.frombuffer(
        body, dtype=np.uint8, count=l_seq, offset=offset
    ).copy()
    offset += l_seq
    aux, raw_tags = _parse_bam_aux(body[offset:])
    return HtsRecord(
        bytes(name), flag, code, quality, aux,
        ref_id=ref_id, pos=pos, mapq=mapq, cigar=cigar,
        next_ref=next_ref, next_pos=next_pos, tlen=tlen,
        raw_tags=raw_tags,
    )


def read_bam(path: str):
    """Yield HtsRecord from a BAM file (see iter_bam_record_bodies for
    the decompression path)."""
    for body in iter_bam_record_bodies(path):
        yield record_from_bam_body(body)


def read_sam(path: str):
    """Yield HtsRecord from SAM text (plain or gzip)."""
    from .fastq import open_maybe_compressed

    stream = open_maybe_compressed(path)
    try:
        for line in stream:
            if line.startswith(b"@"):
                continue
            fields = line.rstrip(b"\r\n").split(b"\t")
            if len(fields) < 11:
                raise SequenceError(f"corrupt SAM record in {path}")
            name = fields[0]
            flag = int(fields[1])
            seq = fields[9]
            qual = fields[10]
            if seq == b"*":
                code = np.zeros(0, dtype=np.uint8)
                quality = np.zeros(0, dtype=np.uint8)
            else:
                code = ASCII_TO_BAM[np.frombuffer(seq, dtype=np.uint8)]
                if qual == b"*":
                    quality = np.zeros(len(seq), dtype=np.uint8)
                else:
                    quality = (
                        np.frombuffer(qual, dtype=np.uint8).astype(np.int16) - 33
                    ).clip(0).astype(np.uint8)
            aux = {}
            for field in fields[11:]:
                tag = field[:2].decode()
                kind = chr(field[3])
                value = field[5:]
                if kind == "i":
                    aux[tag] = int(value)
                elif kind == "f":
                    aux[tag] = float(value)
                else:
                    aux[tag] = value.decode()
            yield HtsRecord(bytes(name), flag, code, quality, aux)
    finally:
        stream.close()


def hts_record_reader(path: str, format_type: str):
    """Record iterator for any HTS container format (sam/bam/cram)."""
    if format_type == "bam":
        return read_bam(path)
    if format_type == "cram":
        from .cram import read_cram

        return read_cram(path)
    return read_sam(path)


def hts_read_batches(path: str, format_type: str, batch_size: int):
    """Assemble ReadBatches from an interleaved SAM/BAM feed: consecutive
    records sharing a name form one read (reference hts.h sensing +
    transcode.cpp:559-682)."""
    from ..model.batch import ReadBatch
    from ..transform import SegmentBatch

    reader = hts_record_reader(path, format_type)
    pending: list[list[HtsRecord]] = []
    current: list[HtsRecord] = []

    def flush_reads():
        nonlocal pending
        if not pending:
            return None
        n = len(pending)
        cardinality = len(pending[0])
        for read in pending:
            if len(read) != cardinality:
                raise SequenceError(
                    f"inconsistent segment cardinality in {path} for "
                    f"{read[0].name.decode()}"
                )
        segments = []
        for s in range(cardinality):
            lengths = np.array(
                [len(read[s].code) for read in pending], dtype=np.int32
            )
            width = int(lengths.max(initial=1))
            code = np.zeros((n, width), dtype=np.uint8)
            qual = np.zeros((n, width), dtype=np.uint8)
            for r, read in enumerate(pending):
                code[r, : lengths[r]] = read[s].code
                qual[r, : lengths[r]] = read[s].quality
            segments.append(
                SegmentBatch(code=code, quality=qual, length=lengths)
            )
        batch = ReadBatch(
            segments=segments,
            names=[read[0].name for read in pending],
            qcfail=np.array(
                [read[0].qcfail for read in pending], dtype=bool
            ),
        )
        pending = []
        return batch

    for record in reader:
        if current and record.name != current[0].name:
            pending.append(current)
            current = []
            if len(pending) >= batch_size:
                yield flush_reads()
        current.append(record)
    if current:
        pending.append(current)
    batch = flush_reads()
    if batch is not None:
        yield batch
