"""CRAM 3.1 name tokenizer (block compression method 8, "tok3").

From-scratch implementation of the hts-specs CRAMcodecs name
tokenisation codec: read names split into typed tokens (alpha runs,
single chars, digit runs with/without leading zeros), each token
position's values collected into per-(position, type) byte streams,
each stream rANS-Nx16 compressed, with names encoded as deltas against
an earlier name (MATCH/DELTA tokens) or whole-name duplicates. The
reference reads these through htslib (reference hts.h:42-299).

Serialized layout:

    ulen:4 LE  (decoded size incl. one separator per name)
    nnames:4 LE
    use_arith:1  (1 = streams use the adaptive arithmetic coder — not
                  implemented here; emitted streams always use rANS)
    repeat: ttype:1 [dup_pos:1 dup_type:1 | clen:uint7 stream bytes]
      ttype bits: 0-5 token type, 6 = duplicate of an earlier stream,
      7 = first stream of a new token position

Token types (spec order): TYPE=0 ALPHA=1 CHAR=2 DIGITS0=3 DZLEN=4
DUP=5 DIFF=6 DIGITS=7 DELTA=8 DELTA0=9 MATCH=10 NOP=11 END=12.
"""

from __future__ import annotations

import struct

from ..errors import IOError_
from .rans_nx16 import (
    CAT,
    ORDER1,
    PACK,
    rans_nx16_compress,
    rans_nx16_uncompress,
    uint7_get,
    uint7_put,
)

N_TYPE = 0
N_ALPHA = 1
N_CHAR = 2
N_DIGITS0 = 3
N_DZLEN = 4
N_DUP = 5
N_DIFF = 6
N_DIGITS = 7
N_DELTA = 8
N_DELTA0 = 9
N_MATCH = 10
N_NOP = 11
N_END = 12
N_TYPES = 13

TOK_NEW = 0x80
TOK_DUP = 0x40


def _tokenize(name: bytes) -> list[tuple[int, bytes]]:
    """Split a name into (type, value) fragments: maximal alpha/other
    runs and digit runs (leading zeros -> DIGITS0 with explicit length)."""
    tokens: list[tuple[int, bytes]] = []
    i = 0
    n = len(name)
    while i < n:
        b = name[i]
        if 0x30 <= b <= 0x39:
            j = i
            while j < n and 0x30 <= name[j] <= 0x39:
                j += 1
            run = name[i:j]
            # leading zero or too large for uint32: keep the exact digits
            if (run[0] == 0x30 and len(run) > 1) or int(run) > 0xFFFFFFFF:
                tokens.append((N_DIGITS0, run))
            else:
                tokens.append((N_DIGITS, run))
            i = j
        elif (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A):
            j = i
            while j < n and (
                0x41 <= name[j] <= 0x5A or 0x61 <= name[j] <= 0x7A
            ):
                j += 1
            tokens.append((N_ALPHA, name[i:j]))
            i = j
        else:
            tokens.append((N_CHAR, name[i : i + 1]))
            i += 1
    return tokens


class _Streams:
    """Per-(position, type) byte stream accumulator / reader."""

    def __init__(self):
        self.data: dict[tuple[int, int], bytearray] = {}
        self.cursor: dict[tuple[int, int], int] = {}

    def put(self, pos: int, ttype: int, payload: bytes):
        self.data.setdefault((pos, ttype), bytearray()).extend(payload)

    def get(self, pos: int, ttype: int, count: int) -> bytes:
        key = (pos, ttype)
        cur = self.cursor.get(key, 0)
        stream = self.data.get(key)
        if stream is None or cur + count > len(stream):
            raise IOError_(
                f"tok3 stream underflow at position {pos} type {ttype}"
            )
        self.cursor[key] = cur + count
        return bytes(stream[cur : cur + count])

    def get_until_nul(self, pos: int, ttype: int) -> bytes:
        key = (pos, ttype)
        cur = self.cursor.get(key, 0)
        stream = self.data.get(key)
        if stream is None:
            raise IOError_(f"tok3 missing stream {pos}/{ttype}")
        end = stream.find(b"\0", cur)
        if end < 0:
            raise IOError_("tok3 unterminated string token")
        self.cursor[key] = end + 1
        return bytes(stream[cur:end])


def tok3_encode(names: list[bytes], level_order1: bool = True) -> bytes:
    """Serialize a name list. Each name is tokenized; token values are
    stored as MATCH/DELTA against the previous name where possible."""
    ulen = sum(len(name) + 1 for name in names)
    streams = _Streams()
    prev_tokens: list[list[tuple[int, bytes]]] = []
    name_index: dict[bytes, int] = {}
    max_pos = 0

    for i, name in enumerate(names):
        if name in name_index:
            dist = i - name_index[name]
            streams.put(0, N_TYPE, bytes((N_DUP,)))
            streams.put(0, N_DUP, struct.pack("<I", dist))
            prev_tokens.append(prev_tokens[name_index[name]])
            name_index[name] = i
            continue
        # delta against the immediately previous (non-dup) name
        prev = prev_tokens[i - 1] if i else None
        dist = 1 if prev is not None else 0
        streams.put(0, N_TYPE, bytes((N_DIFF,)))
        streams.put(0, N_DIFF, struct.pack("<I", dist))
        tokens = _tokenize(name)
        for p, (ttype, value) in enumerate(tokens, start=1):
            max_pos = max(max_pos, p)
            ptok = (
                prev[p - 1] if prev is not None and p - 1 < len(prev)
                else None
            )
            if ptok is not None and ptok[0] == ttype and ptok[1] == value:
                streams.put(p, N_TYPE, bytes((N_MATCH,)))
                continue
            if ttype == N_DIGITS:
                value_int = int(value)
                if (
                    ptok is not None
                    and ptok[0] == N_DIGITS
                    and 0 <= value_int - int(ptok[1]) < 256
                ):
                    streams.put(p, N_TYPE, bytes((N_DELTA,)))
                    streams.put(
                        p, N_DELTA, bytes((value_int - int(ptok[1]),))
                    )
                else:
                    streams.put(p, N_TYPE, bytes((N_DIGITS,)))
                    streams.put(p, N_DIGITS, struct.pack("<I", value_int))
            elif (
                ttype == N_DIGITS0
                and int(value) <= 0xFFFFFFFF
                and len(value) <= 255
            ):
                value_int = int(value)
                if (
                    ptok is not None
                    and ptok[0] == N_DIGITS0
                    and len(ptok[1]) == len(value)
                    and 0 <= value_int - int(ptok[1]) < 256
                ):
                    streams.put(p, N_TYPE, bytes((N_DELTA0,)))
                    streams.put(
                        p, N_DELTA0, bytes((value_int - int(ptok[1]),))
                    )
                else:
                    streams.put(p, N_TYPE, bytes((N_DIGITS0,)))
                    streams.put(p, N_DIGITS0, struct.pack("<I", value_int))
                    streams.put(p, N_DZLEN, bytes((len(value),)))
            elif ttype == N_ALPHA or ttype == N_DIGITS0:
                # digit runs that overflow uint32 or whose zero-padded
                # width exceeds the one-byte DZLEN field store verbatim
                streams.put(p, N_TYPE, bytes((N_ALPHA,)))
                streams.put(p, N_ALPHA, value + b"\0")
            else:
                streams.put(p, N_TYPE, bytes((N_CHAR,)))
                streams.put(p, N_CHAR, value)
        end_pos = len(tokens) + 1
        max_pos = max(max_pos, end_pos)
        streams.put(end_pos, N_TYPE, bytes((N_END,)))
        prev_tokens.append(tokens)
        name_index[name] = i

    out = bytearray()
    out += struct.pack("<I", ulen)
    out += struct.pack("<I", len(names))
    out.append(0)  # rANS streams, not arithmetic
    flags = (ORDER1 | PACK) if level_order1 else 0
    seen: dict[bytes, tuple[int, int]] = {}
    for pos in range(0, max_pos + 1):
        first_of_pos = True
        for ttype in range(N_TYPES):
            stream = streams.data.get((pos, ttype))
            if stream is None:
                continue
            lead = ttype | (TOK_NEW if first_of_pos else 0)
            first_of_pos = False
            body = bytes(stream)
            if body in seen and len(body) > 4:
                dup_pos, dup_type = seen[body]
                out.append(lead | TOK_DUP)
                out.append(dup_pos)
                out.append(dup_type)
                continue
            if pos <= 255:
                # the dup reference is a single byte on the wire: only
                # streams at positions that fit can be referenced later
                seen.setdefault(body, (pos, ttype))
            comp = rans_nx16_compress(body, flags)
            if len(comp) >= len(body):
                # entropy coding lost (tiny or incompressible stream):
                # try plain order-0, then fall back to stored (CAT)
                comp0 = rans_nx16_compress(body, 0)
                if len(comp0) < len(comp):
                    comp = comp0
                if len(comp) >= len(body):
                    comp = rans_nx16_compress(body, CAT)
            out.append(lead)
            out += uint7_put(len(comp))
            out += comp
    return bytes(out)


def tok3_decode(data: bytes) -> list[bytes]:
    """Decode a tok3 block to the name list; corrupt input raises the
    typed IOError_ (exit 6)."""
    try:
        return _decode(data)
    except IOError_:
        raise
    except (IndexError, ValueError, KeyError, struct.error) as error:
        raise IOError_(f"corrupt tok3 stream: {error!r}") from error


def _decode(data: bytes) -> list[bytes]:
    if len(data) < 9:
        raise IOError_("tok3 stream too short")
    ulen, nnames = struct.unpack_from("<II", data, 0)
    if ulen > (1 << 31) or nnames > (1 << 28):
        raise IOError_("tok3 header sizes implausible")
    use_arith = data[8]
    if use_arith & 1:
        raise IOError_(
            "tok3 streams using the adaptive arithmetic coder are not"
            " supported (rANS-coded tok3 is)"
        )
    offset = 9
    streams = _Streams()
    pos = -1
    end = len(data)
    while offset < end:
        lead = data[offset]
        offset += 1
        ttype = lead & 0x3F
        if ttype >= N_TYPES:
            raise IOError_(f"tok3 token type {ttype} invalid")
        if lead & TOK_NEW:
            pos += 1
        if pos < 0:
            raise IOError_("tok3 stream before first position marker")
        if lead & TOK_DUP:
            dup_pos = data[offset]
            dup_type = data[offset + 1]
            offset += 2
            src = streams.data.get((dup_pos, dup_type))
            if src is None:
                raise IOError_("tok3 duplicate of a missing stream")
            streams.put(pos, ttype, bytes(src))
        else:
            clen, offset = uint7_get(data, offset)
            body = rans_nx16_uncompress(data[offset : offset + clen])
            offset += clen
            streams.put(pos, ttype, body)

    names: list[bytes] = []
    tokens_by_name: list[list[bytes]] = []
    for i in range(nnames):
        (kind,) = streams.get(0, N_TYPE, 1)
        if kind == N_DUP:
            (dist,) = struct.unpack("<I", streams.get(0, N_DUP, 4))
            if not 0 < dist <= i:
                raise IOError_("tok3 duplicate distance out of range")
            names.append(names[i - dist])
            tokens_by_name.append(tokens_by_name[i - dist])
            continue
        if kind != N_DIFF:
            raise IOError_(f"tok3 name opens with token {kind}")
        (dist,) = struct.unpack("<I", streams.get(0, N_DIFF, 4))
        if dist > i:
            raise IOError_("tok3 diff distance out of range")
        prev = tokens_by_name[i - dist] if dist else []
        parts: list[bytes] = []
        p = 0
        while True:
            p += 1
            (t,) = streams.get(p, N_TYPE, 1)
            if t == N_END:
                break
            if t == N_MATCH:
                if p - 1 >= len(prev):
                    raise IOError_("tok3 MATCH without a previous token")
                parts.append(prev[p - 1])
            elif t == N_ALPHA:
                parts.append(streams.get_until_nul(p, N_ALPHA))
            elif t == N_CHAR:
                parts.append(streams.get(p, N_CHAR, 1))
            elif t == N_DIGITS:
                (v,) = struct.unpack("<I", streams.get(p, N_DIGITS, 4))
                parts.append(b"%d" % v)
            elif t == N_DIGITS0:
                (v,) = struct.unpack("<I", streams.get(p, N_DIGITS0, 4))
                (w,) = streams.get(p, N_DZLEN, 1)
                parts.append(b"%0*d" % (w, v))
            elif t == N_DELTA:
                if p - 1 >= len(prev):
                    raise IOError_("tok3 DELTA without a previous token")
                (d,) = streams.get(p, N_DELTA, 1)
                parts.append(b"%d" % (int(prev[p - 1]) + d))
            elif t == N_DELTA0:
                if p - 1 >= len(prev):
                    raise IOError_("tok3 DELTA0 without a previous token")
                (d,) = streams.get(p, N_DELTA0, 1)
                base = prev[p - 1]
                parts.append(b"%0*d" % (len(base), int(base) + d))
            elif t == N_NOP:
                parts.append(b"")
            else:
                raise IOError_(f"tok3 token type {t} unexpected mid-name")
        names.append(b"".join(parts))
        tokens_by_name.append(parts)
    total = sum(len(n) + 1 for n in names)
    if total != ulen:
        raise IOError_("tok3 decoded size mismatch")
    return names


def tok3_uncompress_block(data: bytes, separator: bytes = b"\n") -> bytes:
    """Decode a tok3 block back to separator-joined name bytes (one
    trailing separator per name, matching the advertised ulen)."""
    names = tok3_decode(data)
    return b"".join(name + separator for name in names)


__all__ = ["tok3_encode", "tok3_decode", "tok3_uncompress_block"]
