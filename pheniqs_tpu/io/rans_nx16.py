"""rANS Nx16 codec (CRAM 3.1 block compression method 5), from the spec.

From-scratch implementation of the hts-specs CRAMcodecs "rANS Nx16"
format (the htscodecs rans4x16pr stream layout): 32-bit rANS states with
16-bit renormalisation, 12-bit (order-0) or 12/10-bit (order-1)
frequencies, 4- or 32-way state interleave, and the four stream
transforms — bit-PACK, RLE, CAT (stored) and STRIPE — composable via the
leading flag byte. The reference reads these streams through htslib
(reference hts.h:42-299); this module exists because htslib is not part
of this framework.

Layout summary (decode order):

    flags:1  [ulen:uint7 unless NOSZ]
    STRIPE -> n:1, n x clen:uint7, n x nested rANS-Nx16 streams,
              output byte-interleaved
    PACK meta -> nsym:1, nsym map bytes, packed-len:uint7
    RLE meta  -> rle-len:uint7, rmeta-len:uint7,
                 raw meta (rmeta-len odd) | compressed meta (order-0)
    payload   -> CAT: raw bytes | rANS order-0/1 (N=4 or 32 states)
    then undo RLE, then undo PACK

Flag byte: 0x01 order-1, 0x04 32-way interleave, 0x08 stripe,
0x10 no-size, 0x20 cat, 0x40 RLE, 0x80 pack.
"""

from __future__ import annotations

import numpy as np

from ..errors import IOError_

ORDER1 = 0x01
X32 = 0x04
STRIPE = 0x08
NOSZ = 0x10
CAT = 0x20
RLE = 0x40
PACK = 0x80

TF_SHIFT_O0 = 12
RANS_L = 1 << 15


# --- varint ----------------------------------------------------------------


def uint7_put(value: int) -> bytes:
    """Big-endian base-128 varint (hts-specs uint7)."""
    if value < 0:
        raise ValueError("uint7 encodes non-negative values")
    chunks = [value & 0x7F]
    value >>= 7
    while value:
        chunks.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(chunks))


def uint7_get(buf, offset: int) -> tuple[int, int]:
    value = 0
    while True:
        byte = buf[offset]
        offset += 1
        value = (value << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return value, offset


# --- alphabet + frequencies ------------------------------------------------


def _put_alphabet(symbols: list[int]) -> bytes:
    """Ascending symbol list with run-length encoding of consecutive
    symbols: after a symbol that is exactly previous+1, a run byte gives
    how many further consecutive symbols follow. Terminated by 0 (legal
    because symbols ascend, so 0 can only open the list)."""
    out = bytearray()
    i = 0
    last = -2
    while i < len(symbols):
        sym = symbols[i]
        out.append(sym)
        if sym == last + 1:
            # count the run after this symbol
            run = 0
            while (
                i + run + 1 < len(symbols)
                and symbols[i + run + 1] == sym + run + 1
            ):
                run += 1
            out.append(run)
            i += run + 1
            last = sym + run
        else:
            last = sym
            i += 1
    out.append(0)
    return bytes(out)


def _get_alphabet(buf, offset: int) -> tuple[list[int], int]:
    symbols: list[int] = []
    rle = 0
    sym = buf[offset]
    offset += 1
    last = -2
    while True:
        if sym > 255 or len(symbols) >= 256:
            raise IOError_("rANS Nx16 alphabet overruns the symbol space")
        symbols.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
            last = sym - 1
        else:
            last = sym
            sym = buf[offset]
            offset += 1
            if sym == last + 1:
                rle = buf[offset]
                offset += 1
        if rle == 0 and sym <= last:
            if sym != 0:
                raise IOError_("rANS Nx16 alphabet not ascending")
            break
    return symbols, offset


def _normalize(freqs: dict[int, int], target: int) -> dict[int, int]:
    """Scale frequencies to sum exactly `target`, keeping every present
    symbol nonzero; the rounding remainder lands on the most frequent
    symbol (the spec's decoder-side normalisation — our encoder always
    writes already-normalised tables, so this only fires on streams from
    other encoders)."""
    total = sum(freqs.values())
    if total == target or total == 0:
        return freqs
    scaled: dict[int, int] = {}
    for sym, f in freqs.items():
        scaled[sym] = max(1, (f * target) // total)
    top = max(scaled, key=lambda s: (scaled[s], -s))
    scaled[top] += target - sum(scaled.values())
    if scaled[top] < 1:
        raise IOError_("rANS Nx16 frequency normalisation failed")
    return scaled


# --- order-0 core ----------------------------------------------------------


def _o0_encode(data: bytes, n_states: int) -> bytes:
    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    symbols = [int(s) for s in np.nonzero(counts)[0]]
    if not symbols:
        symbols = [0]
        counts = counts.copy()
        counts[0] = 1
    freqs = _normalize(
        {s: int(counts[s]) for s in symbols}, 1 << TF_SHIFT_O0
    )
    out = bytearray(_put_alphabet(symbols))
    for s in symbols:
        out += uint7_put(freqs[s])

    cum: dict[int, int] = {}
    acc = 0
    for s in symbols:
        cum[s] = acc
        acc += freqs[s]

    # encode back-to-front; state j owns positions i with i % N == j
    states = [RANS_L] * n_states
    payload = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i % n_states
        sym = data[i]
        f, c = freqs[sym], cum[sym]
        x = states[j]
        x_max = ((RANS_L >> TF_SHIFT_O0) << 16) * f
        while x >= x_max:
            payload += bytes((x & 0xFF, (x >> 8) & 0xFF))
            x >>= 16
        states[j] = ((x // f) << TF_SHIFT_O0) + (x % f) + c
    head = bytearray()
    for j in range(n_states):
        head += int(states[j]).to_bytes(4, "little")
    return bytes(out) + bytes(head) + bytes(reversed_pairs(payload))


def reversed_pairs(payload: bytearray) -> bytes:
    """The encoder emits renorm 16-bit words last-first; the decoder
    reads them first-to-last, so reverse in 2-byte units."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint16)
    return arr[::-1].tobytes()


def _o0_decode(buf, offset: int, out_len: int, n_states: int
               ) -> tuple[bytes, int]:
    symbols, offset = _get_alphabet(buf, offset)
    freqs: dict[int, int] = {}
    for s in symbols:
        freqs[s], offset = uint7_get(buf, offset)
    freqs = _normalize(freqs, 1 << TF_SHIFT_O0)
    # dense lookup tables over the 12-bit slot space
    slot_sym = np.zeros(1 << TF_SHIFT_O0, dtype=np.uint8)
    slot_f = np.zeros(1 << TF_SHIFT_O0, dtype=np.uint32)
    slot_c = np.zeros(1 << TF_SHIFT_O0, dtype=np.uint32)
    acc = 0
    for s in symbols:
        f = freqs[s]
        slot_sym[acc : acc + f] = s
        slot_f[acc : acc + f] = f
        slot_c[acc : acc + f] = acc
        acc += f
    if acc != 1 << TF_SHIFT_O0:
        raise IOError_("rANS Nx16 order-0 frequencies do not sum to 4096")

    states = np.empty(n_states, dtype=np.uint64)
    for j in range(n_states):
        states[j] = int.from_bytes(buf[offset : offset + 4], "little")
        offset += 4
    out = np.empty(out_len, dtype=np.uint8)
    mask = (1 << TF_SHIFT_O0) - 1
    full = out_len // n_states
    pos = offset
    buf_len = len(buf)
    # lockstep vectorised decode over the N states
    states_v = states.astype(np.uint64)
    for i in range(full):
        m = (states_v & mask).astype(np.int64)
        syms = slot_sym[m]
        out[i * n_states : (i + 1) * n_states] = syms
        states_v = (
            slot_f[m].astype(np.uint64) * (states_v >> TF_SHIFT_O0)
            + m.astype(np.uint64)
            - slot_c[m].astype(np.uint64)
        )
        need = states_v < RANS_L
        if need.any():
            for j in np.nonzero(need)[0]:
                if pos + 2 > buf_len:
                    raise IOError_("rANS Nx16 truncated stream")
                word = buf[pos] | (buf[pos + 1] << 8)
                pos += 2
                states_v[j] = (states_v[j] << np.uint64(16)) | np.uint64(word)
    for i in range(full * n_states, out_len):
        j = i % n_states
        x = int(states_v[j])
        m = x & mask
        out[i] = slot_sym[m]
        x = int(slot_f[m]) * (x >> TF_SHIFT_O0) + m - int(slot_c[m])
        if x < RANS_L:
            if pos + 2 > buf_len:
                raise IOError_("rANS Nx16 truncated stream")
            x = (x << 16) | (buf[pos] | (buf[pos + 1] << 8))
            pos += 2
        states_v[j] = x
    return out.tobytes(), pos


# --- order-1 core ----------------------------------------------------------


def _o1_freq_bytes(data: bytes, n_states: int, shift: int
                   ) -> tuple[bytes, dict, list[int]]:
    """Serialized order-1 frequency tables + normalized python tables."""
    n = len(data)
    frag = n // n_states
    counts = np.zeros((256, 256), dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8)
    if n:
        ctx = arr[:-1].astype(np.int32)
        nxt = arr[1:].astype(np.int32)
        np.add.at(counts, (ctx, nxt), 1)
        # fragment leaders decode with context 0, and their real
        # predecessor transition never happens (frag == 0 collapses all
        # leaders onto position 0, which the tail decodes with ctx 0)
        leaders = (
            {j * frag for j in range(n_states)} if frag else {0}
        )
        for start in leaders:
            if start < n:
                counts[0, arr[start]] += 1
                if start > 0:
                    counts[arr[start - 1], arr[start]] -= 1
    used = sorted(
        set(np.nonzero(counts.sum(axis=1))[0].tolist())
        | set(np.nonzero(counts.sum(axis=0))[0].tolist())
        | ({int(arr[0])} if n else set())
        | {0}
    )
    tables: dict[int, dict[int, int]] = {}
    out = bytearray(_put_alphabet(used))
    for i in used:
        row = {
            j: int(counts[i, j]) for j in used if counts[i, j] > 0
        }
        if not row:
            row = {used[0]: 1}
        row = _normalize(row, 1 << shift)
        tables[i] = row
        for j in used:
            out += uint7_put(row.get(j, 0))
    return bytes(out), tables, used


def _o1_encode(data: bytes, n_states: int) -> bytes:
    shift = TF_SHIFT_O0
    table_bytes, tables, _used = _o1_freq_bytes(data, n_states, shift)
    # compress the tables with order-0 rANS when that helps
    packed_tables = _o0_encode(table_bytes, 4)
    out = bytearray()
    if len(packed_tables) + 2 + len(uint7_put(len(table_bytes))) < len(
        table_bytes
    ):
        out.append((shift << 4) | 1)
        out += uint7_put(len(packed_tables))
        out += uint7_put(len(table_bytes))
        out += packed_tables
    else:
        out.append(shift << 4)
        out += table_bytes

    cum: dict[int, dict[int, int]] = {}
    for i, row in tables.items():
        acc = 0
        c: dict[int, int] = {}
        for j in sorted(row):
            c[j] = acc
            acc += row[j]
        cum[i] = c

    n = len(data)
    frag = n // n_states
    states = [RANS_L] * n_states
    payload = bytearray()

    def put(j: int, ctx: int, sym: int):
        f = tables[ctx][sym]
        c = cum[ctx][sym]
        x = states[j]
        x_max = ((RANS_L >> shift) << 16) * f
        while x >= x_max:
            payload.append(x & 0xFF)
            payload.append((x >> 8) & 0xFF)
            x >>= 16
        states[j] = ((x // f) << shift) + (x % f) + c

    # tail (positions n_states*frag .. n-1) belongs to the LAST state,
    # encoded first (decode emits it last); position 0 (frag == 0 only)
    # decodes with context 0
    for i in range(n - 1, n_states * frag - 1, -1):
        put(n_states - 1, data[i - 1] if i > 0 else 0, data[i])
    # fragments back-to-front, interleaved round-robin like the decoder
    for i in range(frag - 1, -1, -1):
        for j in range(n_states - 1, -1, -1):
            pos = j * frag + i
            ctx = data[pos - 1] if i > 0 else 0
            put(j, ctx, data[pos])
    head = bytearray()
    for j in range(n_states):
        head += int(states[j]).to_bytes(4, "little")
    return bytes(out) + bytes(head) + reversed_pairs(payload)


def _o1_decode(buf, offset: int, out_len: int, n_states: int
               ) -> tuple[bytes, int]:
    lead = buf[offset]
    offset += 1
    shift = lead >> 4
    if shift not in (10, 12):
        raise IOError_(f"rANS Nx16 order-1 shift {shift} invalid")
    if lead & 1:
        clen, offset = uint7_get(buf, offset)
        tlen, offset = uint7_get(buf, offset)
        if tlen > (1 << 26) or clen > len(buf):
            raise IOError_("rANS Nx16 order-1 table size implausible")
        table_buf, _ = _o0_decode(buf[offset : offset + clen], 0, tlen, 4)
        offset += clen
        tbuf, toff = table_buf, 0
    else:
        tbuf, toff = buf, offset

    used, toff = _get_alphabet(tbuf, toff)
    tables: dict[int, dict[int, int]] = {}
    for i in used:
        row: dict[int, int] = {}
        for j in used:
            f, toff = uint7_get(tbuf, toff)
            if f:
                row[j] = f
        tables[i] = _normalize(row, 1 << shift) if row else {}
    if not (lead & 1):
        offset = toff

    # dense per-context lookup
    size = 1 << shift
    slot_sym = np.zeros((256, size), dtype=np.uint8)
    slot_f = np.ones((256, size), dtype=np.uint32)
    slot_c = np.zeros((256, size), dtype=np.uint32)
    for i, row in tables.items():
        acc = 0
        for j in sorted(row):
            f = row[j]
            slot_sym[i, acc : acc + f] = j
            slot_f[i, acc : acc + f] = f
            slot_c[i, acc : acc + f] = acc
            acc += f
        if row and acc != size:
            raise IOError_("rANS Nx16 order-1 row does not sum to 2^shift")

    states = np.empty(n_states, dtype=np.uint64)
    for j in range(n_states):
        states[j] = int.from_bytes(buf[offset : offset + 4], "little")
        offset += 4

    out = np.empty(out_len, dtype=np.uint8)
    frag = out_len // n_states
    ctxs = np.zeros(n_states, dtype=np.int64)
    mask = size - 1
    pos = offset
    buf_len = len(buf)
    starts = np.arange(n_states, dtype=np.int64) * frag
    for i in range(frag):
        m = (states & np.uint64(mask)).astype(np.int64)
        syms = slot_sym[ctxs, m]
        out[starts + i] = syms
        states = (
            slot_f[ctxs, m].astype(np.uint64) * (states >> np.uint64(shift))
            + m.astype(np.uint64)
            - slot_c[ctxs, m].astype(np.uint64)
        )
        need = states < RANS_L
        if need.any():
            for j in np.nonzero(need)[0]:
                if pos + 2 > buf_len:
                    raise IOError_("rANS Nx16 truncated stream")
                word = buf[pos] | (buf[pos + 1] << 8)
                pos += 2
                states[j] = (states[j] << np.uint64(16)) | np.uint64(word)
        ctxs = syms.astype(np.int64)
    # tail rides the last state
    j = n_states - 1
    x = int(states[j])
    ctx = int(ctxs[j]) if frag else 0
    for i in range(n_states * frag, out_len):
        m = x & mask
        sym = int(slot_sym[ctx, m])
        out[i] = sym
        x = int(slot_f[ctx, m]) * (x >> shift) + m - int(slot_c[ctx, m])
        if x < RANS_L:
            if pos + 2 > buf_len:
                raise IOError_("rANS Nx16 truncated stream")
            x = (x << 16) | (buf[pos] | (buf[pos + 1] << 8))
            pos += 2
        ctx = sym
    return out.tobytes(), pos


# --- transforms ------------------------------------------------------------


def _pack_encode(data: bytes) -> tuple[bytes, bytes] | None:
    """-> (meta, packed) or None when the alphabet exceeds 16 symbols."""
    symbols = sorted(set(data))
    if len(symbols) > 16:
        return None
    index = {s: i for i, s in enumerate(symbols)}
    meta = bytes([len(symbols)]) + bytes(symbols)
    arr = np.frombuffer(data, dtype=np.uint8)
    idx = np.zeros(256, dtype=np.uint8)
    for s, i in index.items():
        idx[s] = i
    vals = idx[arr]
    n = len(data)
    if len(symbols) <= 1:
        packed = b""
    elif len(symbols) <= 2:
        pad = (-n) % 8
        v = np.concatenate([vals, np.zeros(pad, dtype=np.uint8)])
        v = v.reshape(-1, 8)
        packed = (
            v[:, 0] | v[:, 1] << 1 | v[:, 2] << 2 | v[:, 3] << 3
            | v[:, 4] << 4 | v[:, 5] << 5 | v[:, 6] << 6 | v[:, 7] << 7
        ).astype(np.uint8).tobytes()
    elif len(symbols) <= 4:
        pad = (-n) % 4
        v = np.concatenate([vals, np.zeros(pad, dtype=np.uint8)])
        v = v.reshape(-1, 4)
        packed = (
            v[:, 0] | v[:, 1] << 2 | v[:, 2] << 4 | v[:, 3] << 6
        ).astype(np.uint8).tobytes()
    else:
        pad = (-n) % 2
        v = np.concatenate([vals, np.zeros(pad, dtype=np.uint8)])
        v = v.reshape(-1, 2)
        packed = (v[:, 0] | v[:, 1] << 4).astype(np.uint8).tobytes()
    return meta, packed


def _pack_decode(packed: bytes, pmap: bytes, out_len: int) -> bytes:
    nsym = len(pmap)
    table = np.frombuffer(pmap, dtype=np.uint8)
    if out_len == 0:
        return b""
    if nsym <= 1:
        if not pmap:
            raise IOError_("rANS Nx16 pack map empty")
        return bytes([pmap[0]]) * out_len
    arr = np.frombuffer(packed, dtype=np.uint8)
    if nsym <= 2:
        bits = np.unpackbits(arr, bitorder="little")
        vals = bits[:out_len]
    elif nsym <= 4:
        vals = np.empty(len(arr) * 4, dtype=np.uint8)
        vals[0::4] = arr & 3
        vals[1::4] = (arr >> 2) & 3
        vals[2::4] = (arr >> 4) & 3
        vals[3::4] = (arr >> 6) & 3
        vals = vals[:out_len]
    else:
        vals = np.empty(len(arr) * 2, dtype=np.uint8)
        vals[0::2] = arr & 15
        vals[1::2] = (arr >> 4) & 15
        vals = vals[:out_len]
    if len(vals) < out_len:
        raise IOError_("rANS Nx16 packed stream short")
    if vals.max(initial=0) >= nsym:
        raise IOError_("rANS Nx16 pack index out of range")
    return table[vals].tobytes()


def _rle_encode(data: bytes) -> tuple[bytes, bytes]:
    """-> (meta, literals): run symbols chosen as every symbol whose
    total run savings are positive; runs (uint7) live in the meta."""
    arr = np.frombuffer(data, dtype=np.uint8)
    savings = np.zeros(256, dtype=np.int64)
    i = 0
    n = len(arr)
    # measure run savings per symbol
    runs: list[tuple[int, int]] = []  # (symbol, run_after_first)
    while i < n:
        j = i + 1
        while j < n and arr[j] == arr[i]:
            j += 1
        run = j - i - 1
        savings[arr[i]] += run - 1  # one literal stays; uint7 cost ~1
        runs.append((int(arr[i]), run))
        i = j
    chosen = set(int(s) for s in np.nonzero(savings > 0)[0])
    if not chosen:
        chosen = {int(arr[0])} if n else {0}
    meta = bytearray()
    meta.append(len(chosen) & 0xFF if len(chosen) < 256 else 0)
    syms = sorted(chosen)
    meta += bytes(syms)
    literals = bytearray()
    for sym, run in runs:
        literals.append(sym)
        if sym in chosen:
            meta += uint7_put(run)
        else:
            literals += bytes([sym]) * run
    return bytes(meta), bytes(literals)


def _rle_decode(literals: bytes, meta: bytes, out_len: int) -> bytes:
    pos = 0
    n = meta[pos]
    pos += 1
    if n == 0:
        n = 256
    run_syms = bytearray(256)
    for s in meta[pos : pos + n]:
        run_syms[s] = 1
    pos += n
    out = bytearray()
    i = 0
    lit_len = len(literals)
    while len(out) < out_len:
        if i >= lit_len:
            raise IOError_("rANS Nx16 RLE literal stream short")
        b = literals[i]
        i += 1
        out.append(b)
        if run_syms[b]:
            run, pos = uint7_get(meta, pos)
            out += bytes([b]) * run
    if len(out) != out_len:
        raise IOError_("rANS Nx16 RLE length mismatch")
    return bytes(out)


# --- public API ------------------------------------------------------------


def rans_nx16_compress(data: bytes, flags: int = 0) -> bytes:
    """Compress with the requested flag set (ORDER1/X32/STRIPE/CAT/RLE/
    PACK; NOSZ is honored). Transforms that cannot apply (pack with >16
    symbols) are silently dropped from the emitted flag byte. Plain
    order-0/1 streams ride the native C++ coder when built (byte-
    identical output, parity-pinned)."""
    if not flags & ~(ORDER1 | X32) and len(data) >= 256:
        from ..native import rans_nx16_compress as native_compress

        compressed = native_compress(bytes(data), flags)
        if compressed is not None:
            return compressed
    out = bytearray()
    emit_flags = flags
    n_states = 32 if flags & X32 else 4

    if flags & STRIPE:
        x = 4
        out.append(emit_flags)
        if not flags & NOSZ:
            out += uint7_put(len(data))
        out.append(x)
        subs = []
        arr = np.frombuffer(data, dtype=np.uint8)
        sub_flags = flags & ~(STRIPE | NOSZ)
        for j in range(x):
            subs.append(
                rans_nx16_compress(arr[j::x].tobytes(), sub_flags)
            )
        for sub in subs:
            out += uint7_put(len(sub))
        for sub in subs:
            out += sub
        return bytes(out)

    payload = data
    pack_meta = b""
    if flags & PACK:
        packed = _pack_encode(payload)
        if packed is None:
            emit_flags &= ~PACK
        else:
            pack_meta, payload = packed
    rle_meta = b""
    rle_pre_len = 0
    if emit_flags & RLE:
        rle_pre_len = len(payload)
        rle_meta, payload = _rle_encode(payload)

    out.append(emit_flags)
    if not flags & NOSZ:
        out += uint7_put(len(data))
    if emit_flags & PACK:
        out += pack_meta
        out += uint7_put(
            rle_pre_len if emit_flags & RLE else len(payload)
        )
    if emit_flags & RLE:
        out += uint7_put(len(payload))
        comp_meta = _o0_encode(rle_meta, 4)
        if len(comp_meta) + 4 < len(rle_meta):
            out += uint7_put(len(rle_meta) << 1)
            out += uint7_put(len(comp_meta))
            out += comp_meta
        else:
            out += uint7_put((len(rle_meta) << 1) | 1)
            out += rle_meta

    if flags & CAT:
        out += payload
    elif flags & ORDER1:
        out += _o1_encode(payload, n_states)
    else:
        out += _o0_encode(payload, n_states)
    return bytes(out)


def rans_nx16_uncompress(data: bytes, expected_size: int | None = None
                         ) -> bytes:
    """Decode one rANS Nx16 stream; corrupt or truncated input raises the
    typed IOError_ (exit 6), never a bare IndexError."""
    try:
        if data and not data[0] & ~(ORDER1 | X32):
            # plain order-0/1 stream: native fast path when built
            ulen, _ = uint7_get(data, 1)
            if 256 <= ulen <= (1 << 31):
                from ..native import rans_nx16_uncompress as native_un

                raw = native_un(bytes(data), ulen)
                if raw is not None:
                    if len(raw) != ulen or (
                        expected_size is not None and ulen != expected_size
                    ):
                        raise IOError_("rANS Nx16 output length mismatch")
                    return raw
        return _uncompress(data, expected_size)
    except IOError_:
        raise
    except (IndexError, ValueError, KeyError, OverflowError) as error:
        raise IOError_(f"corrupt rANS Nx16 stream: {error!r}") from error


def _uncompress(data: bytes, expected_size: int | None = None) -> bytes:
    if not data:
        raise IOError_("empty rANS Nx16 stream")
    flags = data[0]
    offset = 1
    n_states = 32 if flags & X32 else 4
    if flags & NOSZ:
        if expected_size is None:
            raise IOError_("rANS Nx16 NOSZ stream needs an expected size")
        ulen = expected_size
    else:
        ulen, offset = uint7_get(data, offset)
        if expected_size is not None and ulen != expected_size:
            # fail BEFORE allocating what a crafted stream declares:
            # the container (or stripe parent) already knows the size
            raise IOError_(
                f"rANS Nx16 declared size {ulen} mismatches the"
                f" expected {expected_size}"
            )
    if ulen > (1 << 31):
        raise IOError_(f"rANS Nx16 size {ulen} implausible")

    if flags & STRIPE:
        x = data[offset]
        offset += 1
        clens = []
        for _ in range(x):
            clen, offset = uint7_get(data, offset)
            clens.append(clen)
        out = np.zeros(ulen, dtype=np.uint8)
        for j in range(x):
            sub_len = (ulen - j + x - 1) // x
            sub = rans_nx16_uncompress(
                data[offset : offset + clens[j]], expected_size=sub_len
            )
            offset += clens[j]
            if len(sub) != sub_len:
                raise IOError_("rANS Nx16 stripe length mismatch")
            out[j::x] = np.frombuffer(sub, dtype=np.uint8)
        return out.tobytes()

    final_len = ulen
    pack_map = None
    if flags & PACK:
        nsym = data[offset]
        offset += 1
        pack_map = bytes(data[offset : offset + nsym])
        offset += nsym
        ulen, offset = uint7_get(data, offset)
        if ulen > (1 << 31):
            raise IOError_(f"rANS Nx16 packed size {ulen} implausible")
    rle_meta = None
    rle_final = 0
    if flags & RLE:
        rle_final = ulen
        ulen, offset = uint7_get(data, offset)
        rmeta_len, offset = uint7_get(data, offset)
        if ulen > (1 << 31) or (rmeta_len >> 1) > (1 << 27):
            raise IOError_("rANS Nx16 RLE sizes implausible")
        if rmeta_len & 1:
            rle_meta = bytes(data[offset : offset + (rmeta_len >> 1)])
            offset += rmeta_len >> 1
        else:
            c_rmeta_len, offset = uint7_get(data, offset)
            rle_meta, _ = _o0_decode(
                data[offset : offset + c_rmeta_len], 0, rmeta_len >> 1, 4
            )
            offset += c_rmeta_len

    if flags & CAT:
        payload = bytes(data[offset : offset + ulen])
        if len(payload) != ulen:
            raise IOError_("rANS Nx16 CAT stream short")
    elif flags & ORDER1:
        payload, _ = _o1_decode(data, offset, ulen, n_states)
    else:
        payload, _ = _o0_decode(data, offset, ulen, n_states)

    if flags & RLE:
        payload = _rle_decode(payload, rle_meta, rle_final)
    if flags & PACK:
        payload = _pack_decode(payload, pack_map, final_len)
    if len(payload) != final_len:
        raise IOError_("rANS Nx16 output length mismatch")
    return payload


__all__ = [
    "rans_nx16_compress",
    "rans_nx16_uncompress",
    "uint7_put",
    "uint7_get",
    "ORDER1", "X32", "STRIPE", "NOSZ", "CAT", "RLE", "PACK",
]
