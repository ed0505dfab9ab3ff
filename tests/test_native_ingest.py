"""Native C++ FASTQ parser vs the pure-Python reader: byte parity on
plain and gzip feeds, and batch assembly equivalence."""

import numpy as np
import pytest

from pheniqs_tpu.io.fastq import read_fastq
from pheniqs_tpu.iupac import ASCII_TO_BAM


@pytest.fixture(scope="module")
def native():
    from pheniqs_tpu import native as native_module

    if not native_module.available():
        pytest.skip(f"native library unavailable: {native_module.build_error()}")
    return native_module


@pytest.mark.parametrize("suffix", ["", ".gz"])
def test_native_reader_matches_python(native, bdggg, suffix):
    path = f"{bdggg}/BDGGG_s01.fastq{suffix}"
    reader = native.NativeFastqReader(path)
    records = list(read_fastq(path))
    parsed = 0
    while True:
        batch = reader.read_batch(1024)
        if batch is None:
            break
        code, qual, length, qcfail, blob, offsets = batch
        names = [
            blob[offsets[i] : offsets[i + 1]] for i in range(code.shape[0])
        ]
        for i in range(code.shape[0]):
            reference = records[parsed + i]
            n = len(reference.sequence)
            assert length[i] == n
            assert names[i] == reference.name
            assert (
                code[i, :n]
                == ASCII_TO_BAM[np.frombuffer(reference.sequence, np.uint8)]
            ).all()
            assert (qual[i, :n] == np.frombuffer(reference.quality, np.uint8)).all()
            assert bool(qcfail[i]) == reference.qcfail
        parsed += code.shape[0]
    assert parsed == len(records)


def test_native_batch_assembly(native, bdggg):
    from pheniqs_tpu.io.ingest import native_read_batches

    urls = [f"{bdggg}/BDGGG_s0{i}.fastq" for i in (1, 2, 3)]
    batches = list(native_read_batches(urls, 33, batch_size=100))
    assert sum(b.size for b in batches) == 250
    first = batches[0]
    assert first.segment_cardinality == 3
    assert first.segments[1].width == 8  # index segment
    assert first.names[0].startswith(b"M02455:")


def test_native_reader_malformed(native, tmp_path):
    from pheniqs_tpu.errors import SequenceError

    bad = tmp_path / "bad.fastq"
    bad.write_bytes(b"@read1\nACGT\n+\nII\n")  # quality shorter than sequence
    reader = native.NativeFastqReader(str(bad))
    with pytest.raises(SequenceError):
        reader.read_batch(10)
