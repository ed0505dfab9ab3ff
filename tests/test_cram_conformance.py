"""Spec-derived conformance vectors for the CRAM 3.0 reader.

Round-1 validation was purely self-referential (writer -> reader round
trips), so a shared misreading of the spec would pass silently. These
vectors are hand-assembled at the bit/byte level straight from the CRAM
3.0 specification semantics (canonical Huffman §13.6, Beta §13.7, Gamma
§13.8, read features §8.5.10.2, substitution matrix §8.4.2) with
expected outputs computed by hand — they exercise the reader through
container framing the writer never produces (core bit streams, mapped
records, embedded references).
"""

import struct
import zlib

import numpy as np
import pytest

from pheniqs_tpu.errors import IOError_
from pheniqs_tpu.io.cram import (
    CID,
    COMPRESSION_HEADER,
    CORE,
    CRAM_MAGIC,
    EOF_CONTAINER,
    EXTERNAL,
    FILE_HEADER,
    RAW,
    SLICE_HEADER,
    CoreBitReader,
    _canonical_codes,
    _Decoder,
    _sized_map,
    itf8_put,
    ltf8_put,
    read_cram,
    write_block,
)
from pheniqs_tpu.iupac import BAM_TO_ASCII


# --- bit reader ------------------------------------------------------------


def test_core_bit_reader_msb_first():
    # 0b1010_0001 0b1100_0000: bits come out MSB-first across bytes
    reader = CoreBitReader(bytes((0b10100001, 0b11000000)))
    assert [reader.read_bit() for _ in range(4)] == [1, 0, 1, 0]
    assert reader.read_bits(6) == 0b000111
    with pytest.raises(IOError_):
        reader.read_bits(16)


# --- canonical Huffman (§13.6) ---------------------------------------------


def test_canonical_code_assignment():
    # alphabet A,B,C with lengths 1,2,2: canonical codes 0, 10, 11
    table = _canonical_codes([65, 66, 67], [1, 2, 2])
    assert table == {1: {0b0: 65}, 2: {0b10: 66, 0b11: 67}}
    # length-sorted ties break on symbol value: D(2),A(1),C(2) ->
    # A=0, C=10, D=11 (C < D)
    table = _canonical_codes([68, 65, 67], [2, 1, 2])
    assert table == {1: {0b0: 65}, 2: {0b10: 67, 0b11: 68}}


def test_huffman_core_decode():
    # params: alphabet [65,66,67], lengths [1,2,2]
    params = (
        itf8_put(3) + itf8_put(65) + itf8_put(66) + itf8_put(67)
        + itf8_put(3) + itf8_put(1) + itf8_put(2) + itf8_put(2)
    )
    decoder = _Decoder(3, params)  # E_HUFFMAN
    # symbols A B C A -> bits 0 10 11 0 -> 0b0101_1000
    core = CoreBitReader(bytes((0b01011000,)))
    assert [decoder.read_int({}, core) for _ in range(4)] == [65, 66, 67, 65]


def test_huffman_invalid_code_fails_typed():
    # single symbol with a 2-bit code 00; stream starts 11 -> no match
    params = itf8_put(1) + itf8_put(7) + itf8_put(1) + itf8_put(2)
    decoder = _Decoder(3, params)
    with pytest.raises(IOError_):
        decoder.read_int({}, CoreBitReader(b"\xff"))


# --- Beta (§13.7) ----------------------------------------------------------


def test_beta_core_decode():
    # offset 2, length 3: stored bits are value+offset
    params = itf8_put(2) + itf8_put(3)
    decoder = _Decoder(6, params)  # E_BETA
    # values 5, 0 -> stored 7 (111), 2 (010) -> 1110_10xx
    core = CoreBitReader(bytes((0b11101000,)))
    assert decoder.read_int({}, core) == 5
    assert decoder.read_int({}, core) == 0


# --- Gamma (§13.8) ---------------------------------------------------------


def test_gamma_core_decode():
    # offset 1: stored value = value + offset (Elias gamma, no zero)
    params = itf8_put(1)
    decoder = _Decoder(9, params)  # E_GAMMA
    # values 0,4 -> stored 1 ('1'), 5 ('00101') -> 1001_01xx
    core = CoreBitReader(bytes((0b10010100,)))
    assert decoder.read_int({}, core) == 0
    assert decoder.read_int({}, core) == 4


# --- whole-file vectors ----------------------------------------------------


def _container(blocks: list[bytes], n_records: int, ref_id=-1, counter=0,
               bases=0) -> bytes:
    """Independent container framing (mirrors CRAMv3 §7, not the module's
    writer): int32 length + ITF8/LTF8 fields + landmark list + CRC32."""
    data = b"".join(blocks)
    header = (
        struct.pack("<i", len(data))
        + itf8_put(ref_id)
        + itf8_put(0)  # start
        + itf8_put(0)  # span
        + itf8_put(n_records)
        + ltf8_put(counter)
        + ltf8_put(bases)
        + itf8_put(len(blocks))
        + itf8_put(0)  # no landmarks
    )
    return header + struct.pack("<I", zlib.crc32(header) & 0xFFFFFFFF) + data


def _file_definition() -> bytes:
    return CRAM_MAGIC + bytes((3, 0)) + b"conformance-vector__"[:20]


def _header_container(header_text: str) -> bytes:
    raw = struct.pack("<i", len(header_text)) + header_text.encode()
    block = write_block(RAW, FILE_HEADER, 0, raw)
    return _container([block], 0)


def _external_encoding(cid: int) -> bytes:
    return itf8_put(1) + _params(itf8_put(cid))


def _params(body: bytes) -> bytes:
    return itf8_put(len(body)) + body


def _huffman_encoding(alphabet, lengths) -> bytes:
    body = itf8_put(len(alphabet)) + b"".join(itf8_put(s) for s in alphabet)
    body += itf8_put(len(lengths)) + b"".join(itf8_put(l) for l in lengths)
    return itf8_put(3) + _params(body)


def _beta_encoding(offset, length) -> bytes:
    return itf8_put(6) + _params(itf8_put(offset) + itf8_put(length))


def _byte_array_stop_encoding(stop, cid) -> bytes:
    return itf8_put(5) + _params(bytes((stop,)) + itf8_put(cid))


def _compression_header(series: dict[bytes, bytes], preservation=None) -> bytes:
    preservation = preservation if preservation is not None else [
        b"RN\x01", b"AP\x00", b"RR\x00",
        b"TD" + itf8_put(1) + b"\x00",  # one empty tag line
    ]
    pmap = _sized_map(preservation, len(preservation))
    smap = _sized_map([k + v for k, v in series.items()], len(series))
    tmap = _sized_map([], 0)
    return write_block(RAW, COMPRESSION_HEADER, 0, pmap + smap + tmap)


def _slice(n_records, core_bits: bytes, externals: dict[int, bytes],
           ref_id=-1, start=0, embedded_ref=-1) -> list[bytes]:
    ids = sorted(externals)
    header = (
        itf8_put(ref_id) + itf8_put(start) + itf8_put(0)
        + itf8_put(n_records) + ltf8_put(0)
        + itf8_put(1 + len(ids))
        + itf8_put(len(ids)) + b"".join(itf8_put(i) for i in ids)
        + itf8_put(embedded_ref) + bytes(16)
    )
    blocks = [write_block(RAW, SLICE_HEADER, 0, header)]
    blocks.append(write_block(RAW, CORE, 0, core_bits))
    for cid in ids:
        blocks.append(write_block(RAW, EXTERNAL, cid, externals[cid]))
    return blocks


def _bits(bitstring: str) -> bytes:
    bitstring = bitstring.replace(" ", "")
    padded = bitstring + "0" * (-len(bitstring) % 8)
    return bytes(
        int(padded[i : i + 8], 2) for i in range(0, len(padded), 8)
    )


def test_unmapped_records_with_core_huffman_series(tmp_path):
    """Two unmapped detached reads whose integer series live in the CORE
    bit stream as canonical Huffman / Beta codes — framing the module's
    own writer never emits, decoded against hand-computed expectations."""
    # BF: constant 77 via 0-bit Huffman; CF: Huffman over {2:'0', 3:'10'}
    # RL: beta offset 0 length 3; AP/RG/MF/NS/NP/TS/TL: 0-bit constants
    series = {
        b"BF": _huffman_encoding([77], [0]),
        b"CF": _huffman_encoding([2, 3], [1, 2]),
        b"RL": _beta_encoding(0, 3),
        b"AP": _huffman_encoding([0], [0]),
        b"RG": _huffman_encoding([-1], [0]),
        b"RN": _byte_array_stop_encoding(0, CID["RN"]),
        b"MF": _huffman_encoding([2], [0]),
        b"NS": _huffman_encoding([-1], [0]),
        b"NP": _huffman_encoding([0], [0]),
        b"TS": _huffman_encoding([0], [0]),
        b"TL": _huffman_encoding([0], [0]),
        b"BA": _external_encoding(CID["BA"]),
        b"QS": _external_encoding(CID["QS"]),
    }
    # record 1: CF=3 (quality stored, detached) code '10', RL=4 '100'
    # record 2: CF=3 '10', RL=2 '010'
    core = _bits("10 100" + "10 010")
    externals = {
        CID["RN"]: b"alpha\x00beta\x00",
        CID["BA"]: b"ACGT" + b"GG",
        CID["QS"]: bytes((30, 31, 32, 33)) + bytes((40, 41)),
    }
    blob = (
        _file_definition()
        + _header_container("@HD\tVN:1.0\n")
        + _container(
            [_compression_header(series)] + _slice(2, core, externals), 2
        )
        + EOF_CONTAINER
    )
    path = tmp_path / "core_huffman.cram"
    path.write_bytes(blob)

    records = list(read_cram(str(path)))
    assert len(records) == 2
    assert records[0].name == b"alpha"
    assert records[0].flag == 77 | 0x8  # MF=2 -> mate unmapped
    assert BAM_TO_ASCII[records[0].code].tobytes() == b"ACGT"
    np.testing.assert_array_equal(records[0].quality, [30, 31, 32, 33])
    assert records[1].name == b"beta"
    assert BAM_TO_ASCII[records[1].code].tobytes() == b"GG"
    np.testing.assert_array_equal(records[1].quality, [40, 41])


# SM byte for each reference base: the other four bases in A,C,G,T,N
# order receive 2-bit codes 0,1,2,3 MSB-first — so code 0 is the first
# non-reference base in alphabet order.
_IDENTITY_SM = bytes((0b00011011,) * 5)


def _mapped_file(tmp_path, embedded: bool):
    """One mapped record against reference GATTACAGATTACA (start 3):
    features X (substitution), D (deletion), I (insertion), read length 8.

    layout (1-based read positions):
      pos 1: ref[3]='T'
      pos 2: feature X at fpos 2: ref[4]='T', code 2 -> 'G'
             (others for T = A,C,G,N; code 2 -> G)
      pos 3: feature D at fpos 3 skips 2 ref bases ('AC')
             then ref[7]='A' copies through
      pos 4-5: feature I at fpos 4 inserts 'TT'
      pos 6-8: ref[8..10] = 'GAT'
    expected sequence: T G A T T G A T
    """
    reference = b"GATTACAGATTACA"
    series = {
        b"BF": _huffman_encoding([0], [0]),      # mapped, flag 0
        b"CF": _huffman_encoding([3], [0]),      # detached + quality
        b"RL": _huffman_encoding([8], [0]),
        b"AP": _external_encoding(CID["AP"]),
        b"RG": _huffman_encoding([-1], [0]),
        b"RN": _byte_array_stop_encoding(0, CID["RN"]),
        b"MF": _huffman_encoding([0], [0]),
        b"NS": _huffman_encoding([-1], [0]),
        b"NP": _huffman_encoding([0], [0]),
        b"TS": _huffman_encoding([0], [0]),
        b"TL": _huffman_encoding([0], [0]),
        b"FN": _huffman_encoding([3], [0]),      # three features
        b"FC": _external_encoding(20),
        b"FP": _external_encoding(21),
        b"BS": _huffman_encoding([2], [0]),      # substitution code 2
        b"DL": _huffman_encoding([2], [0]),      # deletion length 2
        b"IN": _byte_array_stop_encoding(0, 22),
        b"MQ": _huffman_encoding([60], [0]),
        b"QS": _external_encoding(CID["QS"]),
    }
    externals = {
        CID["AP"]: itf8_put(3),              # alignment start (delta off)
        CID["RN"]: b"mapped1\x00",
        CID["QS"]: bytes(range(10, 18)),
        20: b"XDI",                          # feature codes
        21: itf8_put(2) + itf8_put(1) + itf8_put(1),  # fpos deltas 2,3,4
        22: b"TT\x00",
    }
    preservation = [
        b"RN\x01", b"AP\x00", b"RR\x00",
        b"SM" + _IDENTITY_SM,
        b"TD" + itf8_put(1) + b"\x00",
    ]
    embedded_cid = 25
    if embedded:
        # embedded reference block covers the slice span from start 3
        externals[embedded_cid] = reference[2:]
    slice_blocks = _slice(
        1, b"", externals, ref_id=0, start=3,
        embedded_ref=embedded_cid if embedded else -1,
    )
    blob = (
        _file_definition()
        + _header_container("@HD\tVN:1.0\n@SQ\tSN:chr1\tLN:14\n")
        + _container(
            [_compression_header(series, preservation)] + slice_blocks, 1,
            ref_id=0,
        )
        + EOF_CONTAINER
    )
    path = tmp_path / ("mapped_embedded.cram" if embedded else "mapped.cram")
    path.write_bytes(blob)
    if not embedded:
        fasta = tmp_path / "ref.fa"
        fasta.write_bytes(b">chr1 test\n" + reference + b"\n")
        return path, fasta
    return path, None


@pytest.mark.parametrize("embedded", [True, False])
def test_mapped_record_reconstruction(tmp_path, embedded):
    path, fasta = _mapped_file(tmp_path, embedded)
    records = list(
        read_cram(str(path), reference=str(fasta) if fasta else None)
    )
    assert len(records) == 1
    record = records[0]
    assert record.name == b"mapped1"
    assert record.flag == 0
    assert BAM_TO_ASCII[record.code].tobytes() == b"TGATTGAT"
    np.testing.assert_array_equal(record.quality, list(range(10, 18)))


def test_mapped_record_without_reference_fails_typed(tmp_path):
    path, _fasta = _mapped_file(tmp_path, embedded=False)
    with pytest.raises(IOError_):
        list(read_cram(str(path)))


def test_native_batch_reader_falls_back_on_core_codecs(tmp_path):
    """NativeCramReader must transparently use the Python record decoder
    for slices the native fast path cannot handle (core bit codecs) and
    still deliver correct batches."""
    from pheniqs_tpu.io.cram import NativeCramReader
    from pheniqs_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")

    series = {
        b"BF": _huffman_encoding([77], [0]),
        b"CF": _huffman_encoding([2, 3], [1, 2]),  # CORE codec -> fallback
        b"RL": _beta_encoding(0, 3),
        b"AP": _huffman_encoding([0], [0]),
        b"RG": _huffman_encoding([-1], [0]),
        b"RN": _byte_array_stop_encoding(0, CID["RN"]),
        b"MF": _huffman_encoding([2], [0]),
        b"NS": _huffman_encoding([-1], [0]),
        b"NP": _huffman_encoding([0], [0]),
        b"TS": _huffman_encoding([0], [0]),
        b"TL": _huffman_encoding([0], [0]),
        b"BA": _external_encoding(CID["BA"]),
        b"QS": _external_encoding(CID["QS"]),
    }
    core = _bits("10 100" + "10 010")
    externals = {
        CID["RN"]: b"alpha\x00beta\x00",
        CID["BA"]: b"ACGT" + b"GG",
        CID["QS"]: bytes((30, 31, 32, 33)) + bytes((40, 41)),
    }
    blob = (
        _file_definition()
        + _header_container("@HD\tVN:1.0\n")
        + _container(
            [_compression_header(series)] + _slice(2, core, externals), 2
        )
        + EOF_CONTAINER
    )
    path = tmp_path / "core_fallback.cram"
    path.write_bytes(blob)

    reader = NativeCramReader(str(path))
    batch = reader.read_batch(16)
    assert batch is not None
    code, qual, length, qcfail, names_blob, offsets = batch
    assert code.shape[0] == 2
    assert names_blob[offsets[0] : offsets[1]] == b"alpha"
    assert BAM_TO_ASCII[code[0, : length[0]]].tobytes() == b"ACGT"
    np.testing.assert_array_equal(qual[1, : length[1]], [40, 41])
    assert reader.read_batch(16) is None
    reader.close()


def test_native_batch_reader_matches_read_cram(tmp_path):
    """The native batch reader and the per-record Python reader must agree
    on a writer-produced file (names, codes, qualities, qcfail)."""
    import numpy as np

    from pheniqs_tpu import native
    from pheniqs_tpu.io.cram import CramWriter, NativeCramReader, read_cram
    from pheniqs_tpu.io.sam import AuxTags
    from pheniqs_tpu.iupac import ASCII_TO_BAM

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(5)
    path = tmp_path / "against.cram"
    with open(path, "wb") as stream:
        writer = CramWriter(stream, "@HD\tVN:1.0\n@RG\tID:g\n")
        for i in range(5000):
            n = int(rng.integers(4, 40))
            code = np.array([1, 2, 4, 8], np.uint8)[
                rng.integers(4, size=n)
            ]
            qual = rng.integers(2, 41, size=n).astype(np.uint8)
            tags = AuxTags()
            tags.RG = "g"
            writer.write_record(
                f"r{i}", 77 | (0x200 if i % 11 == 0 else 0),
                ASCII_TO_BAM[np.frombuffer(
                    bytes("ACGT"[c] for c in rng.integers(4, size=0)), np.uint8
                )] if False else code,
                qual, n, tags,
            )
        writer.close()

    expected = list(read_cram(str(path)))
    for force_python in (False, True):
        reader = NativeCramReader(str(path))
        if force_python:
            # lib-optional mode: the vectorized Python column decoder
            # (_decode_detached_columns) must match the C++ slice decoder
            reader._lib = None
        position = 0
        while True:
            batch = reader.read_batch(1024)
            if batch is None:
                break
            code, qual, length, qcfail, blob, offsets = batch
            for i in range(code.shape[0]):
                record = expected[position + i]
                assert blob[offsets[i] : offsets[i + 1]] == record.name
                n = int(length[i])
                assert n == record.code.shape[0]
                np.testing.assert_array_equal(code[i, :n], record.code)
                np.testing.assert_array_equal(qual[i, :n], record.quality)
                assert bool(qcfail[i]) == bool(record.flag & 0x200)
            position += code.shape[0]
        assert position == len(expected)
        reader.close()


# --- Golomb (§13.4), Golomb-Rice (§13.5), Subexponential (§13.9) -----------
# Bit-level semantics follow htslib's cram_codecs.c (the spec's normative
# implementation; the reference delegates to it, hts.cpp:160-240): unary
# quotient/prefix as 1-bits terminated by a 0, truncated-binary remainder
# for non-power-of-two moduli. No real encoder emits these codecs (htslib
# never writes them), so the vectors here are hand-derived.


def _golomb_encoding(offset, m, rice=False) -> bytes:
    return itf8_put(8 if rice else 2) + _params(
        itf8_put(offset) + itf8_put(m)
    )


def _subexp_encoding(offset, k) -> bytes:
    return itf8_put(7) + _params(itf8_put(offset) + itf8_put(k))


def test_golomb_core_decode_non_power_of_two():
    # m=5: b=3, truncated-binary cutoff (1<<3)-5 = 3
    decoder = _Decoder(2, itf8_put(0) + itf8_put(5))
    # values 0, 7, 4, 3 -> bits: q unary + remainder
    #   0: q=0 '0', r=0 '00'         7: q=1 '10', r=2 '10'
    #   4: q=0 '0', r=4 -> 4+3=7 '111'
    #   3: q=0 '0', r=3 -> 3+3=6 '110'
    core = CoreBitReader(_bits("000 1010 0111 0110"))
    assert [decoder.read_int({}, core) for _ in range(4)] == [0, 7, 4, 3]


def test_golomb_offset_shifts_values():
    # offset 2: stored = value + 2, m=3 (b=2, cutoff 1)
    decoder = _Decoder(2, itf8_put(2) + itf8_put(3))
    # value 4 -> stored 6: q=2 '110', r=0 '0'
    core = CoreBitReader(_bits("1100"))
    assert decoder.read_int({}, core) == 4


def test_golomb_rice_power_of_two():
    # m=4 (b=2), offset 1: plain b-bit remainder
    decoder = _Decoder(8, itf8_put(1) + itf8_put(4))
    # value 5 -> stored 6: q=1 '10', r=2 '10'; value 0 -> stored 1: '0','01'
    core = CoreBitReader(_bits("1010 001"))
    assert decoder.read_int({}, core) == 5
    assert decoder.read_int({}, core) == 0


def test_golomb_rice_rejects_non_power_of_two():
    with pytest.raises(IOError_):
        _Decoder(8, itf8_put(0) + itf8_put(5))


def test_golomb_rejects_non_positive_modulus():
    with pytest.raises(IOError_):
        _Decoder(2, itf8_put(0) + itf8_put(0))


def test_subexp_core_decode():
    # k=2, offset 0
    decoder = _Decoder(7, itf8_put(0) + itf8_put(2))
    # 3 (<2^k): u=0 '0' + '11'
    # 9: width 4 -> b=3, u=2: '110' + '001'
    # 4: width 3 -> b=2, u=1: '10' + '00'
    core = CoreBitReader(_bits("011 110001 1000"))
    assert decoder.read_int({}, core) == 3
    assert decoder.read_int({}, core) == 9
    assert decoder.read_int({}, core) == 4


def test_subexp_runaway_prefix_fails_typed():
    decoder = _Decoder(7, itf8_put(0) + itf8_put(2))
    with pytest.raises(IOError_):
        decoder.read_int({}, CoreBitReader(b"\xff" * 10))


def test_unmapped_records_with_golomb_and_subexp_series(tmp_path):
    """Whole-file vector: RL rides a Golomb core series, CF a
    subexponential one — integer series the module's writer never
    produces, through full container framing."""
    series = {
        b"BF": _huffman_encoding([77], [0]),
        b"CF": _subexp_encoding(0, 2),
        b"RL": _golomb_encoding(0, 3),
        b"AP": _huffman_encoding([0], [0]),
        b"RG": _huffman_encoding([-1], [0]),
        b"RN": _byte_array_stop_encoding(0, CID["RN"]),
        b"MF": _huffman_encoding([2], [0]),
        b"NS": _huffman_encoding([-1], [0]),
        b"NP": _huffman_encoding([0], [0]),
        b"TS": _huffman_encoding([0], [0]),
        b"TL": _huffman_encoding([0], [0]),
        b"BA": _external_encoding(CID["BA"]),
        b"QS": _external_encoding(CID["QS"]),
    }
    # record 1: CF=3 subexp k=2 -> '011'; RL=4 golomb m=3 (b=2, cutoff 1):
    #   q=1 '10', r=1 -> 1+1=2 '10'  => '1010'
    # record 2: CF=3 '011'; RL=2: q=0 '0', r=2 -> 2+1=3 '11' => '011'
    core = _bits("011 1010" + "011 011")
    externals = {
        CID["RN"]: b"alpha\x00beta\x00",
        CID["BA"]: b"ACGT" + b"GG",
        CID["QS"]: bytes((30, 31, 32, 33)) + bytes((40, 41)),
    }
    blob = (
        _file_definition()
        + _header_container("@HD\tVN:1.0\n")
        + _container(
            [_compression_header(series)] + _slice(2, core, externals), 2
        )
        + EOF_CONTAINER
    )
    path = tmp_path / "golomb_subexp.cram"
    path.write_bytes(blob)

    records = list(read_cram(str(path)))
    assert len(records) == 2
    assert records[0].name == b"alpha"
    assert BAM_TO_ASCII[records[0].code].tobytes() == b"ACGT"
    np.testing.assert_array_equal(records[0].quality, [30, 31, 32, 33])
    assert records[1].name == b"beta"
    assert BAM_TO_ASCII[records[1].code].tobytes() == b"GG"
    np.testing.assert_array_equal(records[1].quality, [40, 41])


def test_core_codec_out_of_range_byte_fails_typed():
    """A byte series (BA) mapped to a codec whose parameters put the
    symbol outside 0..255 must fail typed, not with a bare ValueError."""
    # beta length 9 offset 0: stored 300 -> byte value 300
    decoder = _Decoder(6, itf8_put(0) + itf8_put(9))
    core = CoreBitReader(_bits(format(300, "09b")))
    with pytest.raises(IOError_):
        decoder.read_bytes({}, 1, core)
    # negative via offset: golomb offset 10, value 0 -> -10
    decoder = _Decoder(2, itf8_put(10) + itf8_put(4))
    with pytest.raises(IOError_):
        decoder.read_byte({}, CoreBitReader(_bits("000")))


def _encode_golomb(values, offset, m) -> str:
    """Spec-side Golomb encoder (test-local, independent of the reader):
    unary quotient in 1-bits + terminating 0, truncated-binary remainder."""
    b = max(m - 1, 0).bit_length()
    cutoff = (1 << b) - m
    bits = []
    for value in values:
        stored = value + offset
        q, r = divmod(stored, m)
        bits.append("1" * q + "0")
        if m & (m - 1) == 0:
            bits.append(format(r, f"0{b}b") if b else "")
        elif r < cutoff:
            bits.append(format(r, f"0{b - 1}b"))
        else:
            bits.append(format(r + cutoff, f"0{b}b"))
    return "".join(bits)


def _encode_subexp(values, offset, k) -> str:
    bits = []
    for value in values:
        stored = value + offset
        if stored < (1 << k):
            bits.append("0" + format(stored, f"0{k}b") if k else "0")
        else:
            width = stored.bit_length() - 1
            u = width - k + 1
            bits.append("1" * u + "0" + format(stored - (1 << width), f"0{width}b"))
    return "".join(bits)


@pytest.mark.parametrize("m", [1, 2, 3, 4, 5, 7, 8, 10, 16, 100])
def test_golomb_seeded_round_trip(m):
    rng = np.random.default_rng(m)
    offset = int(rng.integers(0, 5))
    values = [int(v) for v in rng.integers(0, 200, size=64)]
    decoder = _Decoder(2, itf8_put(offset) + itf8_put(m))
    core = CoreBitReader(_bits(_encode_golomb(values, offset, m)))
    assert [decoder.read_int({}, core) for _ in values] == values


@pytest.mark.parametrize("k", [0, 1, 2, 3, 5, 8])
def test_subexp_seeded_round_trip(k):
    rng = np.random.default_rng(100 + k)
    offset = int(rng.integers(0, 5))
    values = [int(v) for v in rng.integers(0, 4000, size=64)]
    decoder = _Decoder(7, itf8_put(offset) + itf8_put(k))
    core = CoreBitReader(_bits(_encode_subexp(values, offset, k)))
    assert [decoder.read_int({}, core) for _ in values] == values


def test_new_codec_truncated_core_fails_typed():
    """Truncating the core stream mid-value must raise the module's typed
    IOError_, never IndexError/struct.error."""
    for codec, params in (
        (2, itf8_put(0) + itf8_put(5)),
        (7, itf8_put(0) + itf8_put(2)),
        (8, itf8_put(0) + itf8_put(8)),
    ):
        decoder = _Decoder(codec, params)
        full = CoreBitReader(_bits("1" * 12 + "0" + "101101"))
        stream_bytes = full.buf
        for cut in range(len(stream_bytes)):
            core = CoreBitReader(stream_bytes[:cut])
            try:
                while True:
                    decoder.read_int({}, core)
            except IOError_:
                pass  # typed exhaustion/corruption — expected


# --- raw_tags normalization (BAM wire form) ---------------------------------


def test_byte_array_stop_tags_normalize_to_bam_wire_form(tmp_path):
    """Z tags decoded through BYTE_ARRAY_STOP arrive without the
    BAM-mandatory NUL terminator (the stop byte is consumed); captured
    raw_tags must re-add it, and RG tags in the TD dictionary must stay
    OUT of raw_tags (they ride the RG series on re-encode) — otherwise
    re-encoding desyncs or duplicates RG (htslib semantics)."""
    # one record: BC (BYTE_ARRAY_STOP, tab stop) + RG as a TD tag
    bc_key = (ord("B") << 16) | (ord("C") << 8) | ord("Z")
    rg_key = (ord("R") << 16) | (ord("G") << 8) | ord("Z")
    tag_map = [
        itf8_put(bc_key) + _byte_array_stop_encoding(9, 60),
        itf8_put(rg_key) + _byte_array_stop_encoding(9, 61),
    ]
    series = {
        b"BF": _huffman_encoding([77], [0]),
        b"CF": _huffman_encoding([3], [0]),
        b"RL": _huffman_encoding([4], [0]),
        b"AP": _huffman_encoding([0], [0]),
        b"RG": _huffman_encoding([-1], [0]),
        b"RN": _byte_array_stop_encoding(0, CID["RN"]),
        b"MF": _huffman_encoding([2], [0]),
        b"NS": _huffman_encoding([-1], [0]),
        b"NP": _huffman_encoding([0], [0]),
        b"TS": _huffman_encoding([0], [0]),
        b"TL": _huffman_encoding([0], [0]),
        b"BA": _external_encoding(CID["BA"]),
        b"QS": _external_encoding(CID["QS"]),
    }
    preservation = [
        b"RN\x01", b"AP\x00", b"RR\x00",
        b"TD" + itf8_put(7) + b"BCZRGZ\x00",  # one line: BC + RG
    ]
    pmap = _sized_map(preservation, len(preservation))
    smap = _sized_map([k + v for k, v in series.items()], len(series))
    tmap = _sized_map(tag_map, len(tag_map))
    compression = write_block(RAW, COMPRESSION_HEADER, 0, pmap + smap + tmap)

    externals = {
        CID["RN"]: b"alpha\x00",
        CID["BA"]: b"ACGT",
        CID["QS"]: bytes((30, 31, 32, 33)),
        60: b"AGGCATG\t",   # BC value, tab-stopped, no NUL
        61: b"grp1\t",      # RG value as a plain tag
    }
    blob = (
        _file_definition()
        + _header_container("@HD\tVN:1.0\n@RG\tID:grp1\n")
        + _container([compression] + _slice(1, b"", externals), 1)
        + EOF_CONTAINER
    )
    path = tmp_path / "stop_tags.cram"
    path.write_bytes(blob)

    records = list(read_cram(str(path)))
    assert len(records) == 1
    record = records[0]
    assert record.aux["BC"] == "AGGCATG"
    assert record.aux["RG"] == "grp1"
    keys = [key for key, _ in record.raw_tags]
    assert b"RGZ" not in keys  # RG rides the RG series on re-encode
    (bc_raw,) = [v for k, v in record.raw_tags if k == b"BCZ"]
    assert bc_raw == b"AGGCATG\x00"  # NUL restored for the BAM wire form

    # and the BAM wire form re-encodes cleanly: CRAM -> BAM -> parse back
    from pheniqs_tpu.io.cram import cram_to_bam
    from pheniqs_tpu.io.hts import read_bam

    bam = tmp_path / "stop_tags.bam"
    assert cram_to_bam(str(path), str(bam)) == 1
    (back,) = list(read_bam(str(bam)))
    assert back.aux["BC"] == "AGGCATG"
    assert back.aux.get("RG") == "grp1"
    assert [k for k, _ in back.raw_tags].count(b"RGZ") == 0
