"""rANS 4x8 entropy codec (CRAM 3.0 §13, compression method 4).

The 4-way interleaved range asymmetric numeral system coder used by
htslib-written CRAM blocks: 12-bit (TOTFREQ=4096) normalized frequencies,
four parallel states with byte-wise renormalization against a 2^23 lower
bound, order-0 (static byte distribution) and order-1 (previous byte as
context, data split into four quarters each restarting from context 0).

Stream layout: 1 byte order, u32-LE compressed size (bytes after this
9-byte prefix), u32-LE raw size, the run-length-encoded frequency
table(s), four 4-byte LE state flushes, then the renormalization byte
stream. Frequencies are 1 byte when < 0x80 else 2 bytes
((v >> 8) | 0x80, v & 0xFF); symbol lists are ascending with a
run-length byte after a symbol whose predecessor is also present.

Implemented from the specification; validated by exhaustive round-trip
(tests/test_cram.py) — no htslib is present in this environment to
cross-check against its emitted streams.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import IOError_

TOTFREQ = 4096          # 12-bit normalized frequencies
RANS_BYTE_L = 1 << 23   # state lower bound


# --- frequency tables ------------------------------------------------------


def _normalize(counts: np.ndarray) -> np.ndarray:
    """Scale a histogram to sum exactly TOTFREQ, keeping every present
    symbol at frequency >= 1 (the largest symbol absorbs the residual)."""
    total = int(counts.sum())
    if total == 0:
        return counts.astype(np.int64)
    freqs = (counts.astype(np.float64) * (TOTFREQ / total)).astype(np.int64)
    freqs[(counts > 0) & (freqs == 0)] = 1
    residual = TOTFREQ - int(freqs.sum())
    largest = int(freqs.argmax())
    freqs[largest] += residual
    if freqs[largest] <= 0:
        raise IOError_("rANS: degenerate frequency normalization")
    return freqs


def _put_freq(value: int) -> bytes:
    if value < 0x80:
        return bytes((value,))
    return bytes(((value >> 8) | 0x80, value & 0xFF))


def _get_freq(buf, offset):
    if offset >= len(buf):
        raise IOError_("rANS: truncated frequency table")
    b0 = buf[offset]
    if b0 < 0x80:
        return b0, offset + 1
    if offset + 1 >= len(buf):
        raise IOError_("rANS: truncated frequency table")
    return ((b0 & 0x7F) << 8) | buf[offset + 1], offset + 2


def _put_symbol_table(freqs: np.ndarray, emit_freq=True) -> bytes:
    """Ascending symbol list with run-length compression: a symbol whose
    predecessor is also present opens a run counting the consecutive
    symbols that follow (which are then omitted); 0x00 terminates."""
    out = bytearray()
    present = np.flatnonzero(freqs)
    rle = 0
    for index, symbol in enumerate(present):
        symbol = int(symbol)
        if rle:
            rle -= 1
        else:
            out.append(symbol)
            if symbol > 0 and freqs[symbol - 1] > 0:
                run = symbol + 1
                while run < 256 and freqs[run] > 0:
                    run += 1
                rle = run - symbol - 1
                out.append(rle)
        if emit_freq:
            out += _put_freq(int(freqs[symbol]))
    out.append(0)
    return bytes(out)


def _get_symbol_table(buf, offset, read_freq=True):
    """Parse one RLE symbol/frequency table, raising typed IOError_ on any
    malformed input: truncation, or an RLE run walking the symbol index past
    255 (crafted streams must fail typed, never corrupt state)."""
    freqs = np.zeros(256, dtype=np.int64)
    rle = 0
    if offset >= len(buf):
        raise IOError_("rANS: truncated symbol table")
    symbol = buf[offset]
    offset += 1
    while True:
        if read_freq:
            freqs[symbol], offset = _get_freq(buf, offset)
        else:
            freqs[symbol] = 1
        if rle > 0:
            rle -= 1
            symbol += 1
            if symbol > 255:
                raise IOError_("rANS: run-length past symbol 255")
        elif offset < len(buf) and buf[offset] == symbol + 1:
            if offset + 1 >= len(buf):
                raise IOError_("rANS: truncated symbol table")
            symbol = buf[offset]
            offset += 1
            rle = buf[offset]
            offset += 1
        else:
            if offset >= len(buf):
                raise IOError_("rANS: truncated symbol table")
            symbol = buf[offset]
            offset += 1
            if symbol == 0:
                break
    return freqs, offset


def _require_normalized(freqs: np.ndarray):
    """A decodable table's frequencies must sum to exactly TOTFREQ — anything
    else means a crafted/corrupt stream (would overrun the slot lookup)."""
    if int(freqs.sum()) != TOTFREQ:
        raise IOError_("rANS: frequency table does not sum to TOTFREQ")


# --- the coder core --------------------------------------------------------


class _Encoder:
    """One rANS state; emitted bytes accumulate reversed (the stream is
    built back-to-front, as symbols encode in reverse order)."""

    __slots__ = ("x", "out")

    def __init__(self, out: bytearray):
        self.x = RANS_BYTE_L
        self.out = out  # appended bytes are reversed at the end

    def put(self, start: int, freq: int):
        x = self.x
        x_max = ((RANS_BYTE_L >> 12) << 8) * freq
        while x >= x_max:
            self.out.append(x & 0xFF)
            x >>= 8
        self.x = ((x // freq) << 12) + (x % freq) + start

    def flush(self):
        # 4 bytes little-endian; reversed buffer => append high-to-low
        for shift in (24, 16, 8, 0):
            self.out.append((self.x >> shift) & 0xFF)


def _decode_tables(freqs: np.ndarray):
    cumulative = np.zeros(257, dtype=np.int64)
    np.cumsum(freqs, out=cumulative[1:])
    lookup = np.zeros(TOTFREQ, dtype=np.uint8)
    for symbol in np.flatnonzero(freqs):
        lookup[cumulative[symbol] : cumulative[symbol + 1]] = symbol
    return cumulative, lookup


class _Reader:
    __slots__ = ("buf", "offset")

    def __init__(self, buf, offset):
        self.buf = buf
        self.offset = offset

    def u32(self) -> int:
        (value,) = struct.unpack_from("<I", self.buf, self.offset)
        self.offset += 4
        return value

    def renorm(self, x: int) -> int:
        buf, offset = self.buf, self.offset
        while x < RANS_BYTE_L and offset < len(buf):
            x = (x << 8) | buf[offset]
            offset += 1
        self.offset = offset
        return x


# --- order-0 ---------------------------------------------------------------


def _compress_o0(data: bytes) -> bytes:
    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    freqs = _normalize(counts)
    cumulative = np.zeros(257, dtype=np.int64)
    np.cumsum(freqs, out=cumulative[1:])
    table = _put_symbol_table(freqs)

    out = bytearray()
    states = [_Encoder(out) for _ in range(4)]
    # decode order: byte i <- state i%4; encode pushes in reverse
    for i in range(len(data) - 1, -1, -1):
        symbol = data[i]
        states[i & 3].put(int(cumulative[symbol]), int(freqs[symbol]))
    for state in (states[3], states[2], states[1], states[0]):
        state.flush()
    return table + bytes(reversed(out))


def _uncompress_o0(buf, offset: int, raw_size: int) -> bytes:
    freqs, offset = _get_symbol_table(buf, offset)
    _require_normalized(freqs)
    cumulative, lookup = _decode_tables(freqs)
    reader = _Reader(buf, offset)
    x = [reader.u32() for _ in range(4)]
    out = bytearray(raw_size)
    for i in range(raw_size):
        j = i & 3
        slot = x[j] & (TOTFREQ - 1)
        symbol = int(lookup[slot])
        out[i] = symbol
        x[j] = int(freqs[symbol]) * (x[j] >> 12) + slot - int(
            cumulative[symbol]
        )
        x[j] = reader.renorm(x[j])
    return bytes(out)


# --- order-1 ---------------------------------------------------------------


def _compress_o1(data: bytes) -> bytes:
    size = len(data)
    quarter = size >> 2
    arr = np.frombuffer(data, dtype=np.uint8)
    counts = np.zeros((256, 256), dtype=np.int64)
    # context transitions, plus context-0 restarts at each quarter start
    np.add.at(counts, (arr[:-1], arr[1:]), 1)
    counts[0][arr[0]] += 1
    for j in (1, 2, 3):
        counts[0][arr[j * quarter]] += 1

    freqs = np.zeros_like(counts)
    cumulative = np.zeros((256, 257), dtype=np.int64)
    for context in np.flatnonzero(counts.sum(axis=1)):
        freqs[context] = _normalize(counts[context])
        np.cumsum(freqs[context], out=cumulative[context][1:])

    # table: outer context list (RLE, no frequency), inner per-context table
    table = bytearray()
    present = np.flatnonzero(counts.sum(axis=1))
    rle = 0
    present_mask = counts.sum(axis=1) > 0
    for context in present:
        context = int(context)
        if rle:
            rle -= 1
        else:
            table.append(context)
            if context > 0 and present_mask[context - 1]:
                run = context + 1
                while run < 256 and present_mask[run]:
                    run += 1
                rle = run - context - 1
                table.append(rle)
        table += _put_symbol_table(freqs[context])
    table.append(0)

    out = bytearray()
    states = [_Encoder(out) for _ in range(4)]
    # tail: bytes beyond 4*quarter ride state 3
    positions = [quarter - 1, 2 * quarter - 1, 3 * quarter - 1, size - 1]
    last = [data[positions[j]] for j in range(4)]
    i3 = size - 2
    while i3 > 4 * quarter - 2:
        symbol = data[i3]
        states[3].put(
            int(cumulative[symbol][last[3]]), int(freqs[symbol][last[3]])
        )
        last[3] = symbol
        i3 -= 1
    index = [quarter - 2, 2 * quarter - 2, 3 * quarter - 2, i3]
    while index[0] >= 0:
        for j in (3, 2, 1, 0):
            symbol = data[index[j]]
            states[j].put(
                int(cumulative[symbol][last[j]]), int(freqs[symbol][last[j]])
            )
            last[j] = symbol
            index[j] -= 1
    for j in (3, 2, 1, 0):  # quarter-leading bytes, context 0
        states[j].put(int(cumulative[0][last[j]]), int(freqs[0][last[j]]))
    for j in (3, 2, 1, 0):
        states[j].flush()
    return bytes(table) + bytes(reversed(out))


def _uncompress_o1(buf, offset: int, raw_size: int) -> bytes:
    freqs = np.zeros((256, 256), dtype=np.int64)
    cumulative = np.zeros((256, 257), dtype=np.int64)
    lookups: dict[int, np.ndarray] = {}
    rle = 0
    if offset >= len(buf):
        raise IOError_("rANS: truncated context table")
    context = buf[offset]
    offset += 1
    while True:
        freqs[context], offset = _get_symbol_table(buf, offset)
        _require_normalized(freqs[context])
        cumulative[context], lookups[context] = _decode_tables(freqs[context])
        if rle > 0:
            rle -= 1
            context += 1
            if context > 255:
                raise IOError_("rANS: run-length past context 255")
        elif offset < len(buf) and buf[offset] == context + 1:
            if offset + 1 >= len(buf):
                raise IOError_("rANS: truncated context table")
            context = buf[offset]
            offset += 1
            rle = buf[offset]
            offset += 1
        else:
            if offset >= len(buf):
                raise IOError_("rANS: truncated context table")
            context = buf[offset]
            offset += 1
            if context == 0:
                break

    reader = _Reader(buf, offset)
    x = [reader.u32() for _ in range(4)]
    quarter = raw_size >> 2
    out = bytearray(raw_size)
    last = [0, 0, 0, 0]
    for i in range(quarter):
        for j in range(4):
            slot = x[j] & (TOTFREQ - 1)
            context = last[j]
            if context not in lookups:
                raise IOError_("rANS: reference to absent context")
            symbol = int(lookups[context][slot])
            out[j * quarter + i] = symbol
            x[j] = int(freqs[context][symbol]) * (x[j] >> 12) + slot - int(
                cumulative[context][symbol]
            )
            x[j] = reader.renorm(x[j])
            last[j] = symbol
    for i in range(4 * quarter, raw_size):  # tail rides state 3
        slot = x[3] & (TOTFREQ - 1)
        context = last[3]
        if context not in lookups:
            raise IOError_("rANS: reference to absent context")
        symbol = int(lookups[context][slot])
        out[i] = symbol
        x[3] = int(freqs[context][symbol]) * (x[3] >> 12) + slot - int(
            cumulative[context][symbol]
        )
        x[3] = reader.renorm(x[3])
        last[3] = symbol
    return bytes(out)


# --- public API ------------------------------------------------------------


def rans_compress(data: bytes, order: int = 0) -> bytes:
    """Compress to a CRAM method-4 (rANS 4x8) stream (native fast path
    when the host library is built; same wire format either way)."""
    from ..native import available
    from ..native import rans_compress as native_compress

    if available():
        stream = native_compress(data, order)
        if stream is not None:
            return stream
    if len(data) < 4:
        order = 0
    if len(data) == 0:
        payload = b""
    elif order == 1:
        payload = _compress_o1(data)
    else:
        payload = _compress_o0(data)
    return (
        struct.pack("<BII", 1 if order == 1 and len(data) >= 4 else 0,
                    len(payload), len(data))
        + payload
    )


def rans_uncompress(data: bytes, expected_size: int | None = None) -> bytes:
    """Decompress a CRAM method-4 (rANS 4x8) stream (native fast path
    when the host library is built).

    ``expected_size`` is the container's declared raw size (CRAM block
    header ``rsize``); when given, a stream whose own raw-size field
    disagrees is rejected *before* any allocation — a flipped header byte
    must not trigger a multi-GB buffer."""
    if len(data) < 9:
        raise IOError_("rANS: truncated stream")
    order, _csize, raw_size = struct.unpack_from("<BII", data, 0)
    if expected_size is not None and raw_size != expected_size:
        raise IOError_(
            f"rANS: stream raw size {raw_size} != container size {expected_size}"
        )
    if raw_size == 0:
        return b""
    from ..native import available
    from ..native import rans_uncompress as native_uncompress

    if available():
        raw = native_uncompress(data, raw_size)
        if raw is not None:
            return raw
    if order == 0:
        return _uncompress_o0(data, 9, raw_size)
    if order == 1:
        return _uncompress_o1(data, 9, raw_size)
    raise IOError_(f"rANS: unknown order {order}")
