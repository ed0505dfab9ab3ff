"""The strict PAMLD engine must reproduce the reference golden SAM exactly:
classification, qcfail flags and XB confidence tags (test/BDGGG/valid/
annotated.out), including the deterministic handling of observations
shorter than the expected barcode."""

import numpy as np
import pytest

from pheniqs_tpu.decode.oracle import ObservationScratch, pamld_classify
from pheniqs_tpu.decode.spec import BarcodePanel, DecoderSpec
from pheniqs_tpu.io.fastq import FastqReadAssembler
from pheniqs_tpu.iupac import encode_ascii
from pheniqs_tpu.model.batch import ReadBatch
from pheniqs_tpu.transform import Rule

BARCODES = ["AGGCAGAA", "CGTACTAG", "GGACTCCT", "TAAGGCGA", "TCCTGAGC"]
CONCENTRATION = [0.18, 0.20, 0.22, 0.23, 0.17]


@pytest.fixture(scope="module")
def bdggg_batch(bdggg):
    feeds = [(f"{bdggg}/BDGGG_s0{i}.fastq", 1) for i in (1, 2, 3)]
    records = [
        [(r.name, r.sequence, r.quality, r.qcfail) for r in read]
        for read in FastqReadAssembler(feeds)
    ]
    batch = ReadBatch.from_records(records)
    keep = np.ones(batch.size, dtype=bool)
    for i, min_len in ((1, 0), (2, 22)):
        keep &= batch.segments[i].length >= min_len
    return batch.select(keep)


@pytest.fixture(scope="module")
def golden(bdggg):
    out = {}
    for line in open(f"{bdggg}/valid/annotated.out"):
        if line.startswith("@"):
            continue
        fields = line.rstrip("\n").split("\t")
        qname, flag = fields[0], int(fields[1])
        if not flag & 64:
            continue
        tags = dict(t.split(":", 2)[0::2] for t in fields[11:])
        out[qname] = (flag, tags)
    return out


def sample_spec():
    panel = BarcodePanel(
        codes=np.stack([encode_ascii(b) for b in BARCODES]),
        concentration=np.array(CONCENTRATION) * (1 - 0.015),
        segment_lengths=[8],
        keys=BARCODES,
        barcode_strings=[[b] for b in BARCODES],
    )
    return DecoderSpec(
        algorithm="pamld",
        classifier_type="sample",
        index=1,
        rule=Rule.from_ontology({"token": ["1::8"], "knit": ["0"]}),
        panel=panel,
        multiplexing=True,
        noise=0.015,
        confidence_threshold=0.99,
        random_barcode_probability=4.0**-8,
        high_quality_threshold=20,
        high_quality_distance_threshold=1,
    )


def test_pamld_matches_golden_sam(bdggg_batch, golden):
    spec = sample_spec()
    obs = spec.rule.apply(bdggg_batch.segments)
    scratch = ObservationScratch([s.width for s in obs])
    eff_code, eff_qual = scratch.effective(0, obs[0])
    res = pamld_classify(spec, eff_code, eff_qual, bdggg_batch.qcfail.copy())

    assert bdggg_batch.size == 248
    for i, name in enumerate(bdggg_batch.names):
        flag_g, tags_g = golden[name.decode()]
        rg = tags_g["RG"].rsplit(":", 1)[1]
        want = 0 if rg == "undetermined" else BARCODES.index(rg) + 1
        assert int(res.decoded[i]) == want, name
        conf = res.confidence[i]
        xb = "%g" % np.float32(1.0 - conf) if 0 < conf < 1 else None
        assert tags_g.get("XB") == xb, name
        assert bool(flag_g & 512) == bool(res.qcfail[i]), name


def test_observation_scratch_carry():
    """Short observations inherit stale tail bytes from the previous read
    in stream order; the position at the length gets the NUL terminator."""
    from pheniqs_tpu.transform import SegmentBatch

    scratch = ObservationScratch([4])
    batch = SegmentBatch(
        code=np.array(
            [[1, 2, 4, 8], [2, 2, 0, 0], [4, 0, 0, 0]], dtype=np.uint8
        ),
        quality=np.array(
            [[30, 30, 30, 30], [20, 20, 0, 0], [10, 0, 0, 0]], dtype=np.uint8
        ),
        length=np.array([4, 2, 1], dtype=np.int32),
    )
    code, qual = scratch.effective(0, batch)
    np.testing.assert_array_equal(code[0], [1, 2, 4, 8])
    # read 1: data, data, NUL, stale from read 0
    np.testing.assert_array_equal(code[1], [2, 2, 0, 8])
    np.testing.assert_array_equal(qual[1], [20, 20, 0, 30])
    # read 2: data, NUL, stale NUL from read 1, stale from read 0
    np.testing.assert_array_equal(code[2], [4, 0, 0, 8])
    np.testing.assert_array_equal(qual[2], [10, 0, 0, 30])
    # carry state persists across batches
    np.testing.assert_array_equal(scratch.code[0], [4, 0, 0, 8])


def test_native_classify_matches_numpy_oracle():
    """The C++ strict classifier must agree with the NumPy oracle on every
    decision field; confidences may differ by at most 1 ulp (numpy's SIMD
    pow vs libm) — each run uses one path consistently, and the BDGGG
    goldens gate both paths byte-for-byte."""
    import os

    import pheniqs_tpu.native as native_mod
    from pheniqs_tpu.decode import oracle as oracle_mod
    from pheniqs_tpu.decode.spec import spec_from_ontology
    from pheniqs_tpu.device.flagship import flagship_ontology

    if not native_mod.available():
        import pytest

        pytest.skip("native library unavailable")

    ontology = flagship_ontology(sample_barcodes=24, cellular_barcodes=48)
    spec = spec_from_ontology(ontology["sample"], "sample")
    rng = np.random.default_rng(11)
    n, w = 20000, 16
    codes = spec.panel.codes
    obs = codes[rng.integers(codes.shape[0], size=n)].astype(np.uint8)
    err = rng.random((n, w)) < 0.08
    obs = np.where(
        err,
        np.array([1, 2, 4, 8], np.uint8)[rng.integers(4, size=(n, w))],
        obs,
    )
    qual = rng.integers(2, 41, size=(n, w)).astype(np.uint8)
    qual[rng.random((n, w)) < 0.05] = 0
    fail = rng.random(n) < 0.1

    native = oracle_mod.pamld_classify(spec, obs, qual, fail)
    os.environ["PHENIQS_NATIVE"] = "0"
    native_mod._lib = None
    native_mod._build_error = None
    try:
        pure = oracle_mod.pamld_classify(spec, obs, qual, fail)
    finally:
        del os.environ["PHENIQS_NATIVE"]
        native_mod._lib = None
        native_mod._build_error = None

    np.testing.assert_array_equal(native.decoded, pure.decoded)
    np.testing.assert_array_equal(native.edit_distance, pure.edit_distance)
    np.testing.assert_array_equal(native.qcfail, pure.qcfail)
    np.testing.assert_array_equal(native.branch, pure.branch)
    np.testing.assert_array_equal(native.argmax, pure.argmax)
    # <= 1 ulp confidence agreement
    both = np.stack([native.confidence, pure.confidence])
    ulp = np.abs(np.diff(both, axis=0))
    scale = np.maximum(np.abs(pure.confidence), 1e-300)
    assert (ulp[0] / scale <= 4e-16).all()


def test_scratch_fast_path_matches_serial_simulation():
    """ObservationScratch's full-width fast path must leave carry state
    byte-identical to the per-read serial semantics, including a
    full-width batch followed by a batch with short reads that CONSUME
    the carried bytes (reference sequence.h:61-67)."""
    from pheniqs_tpu.decode.oracle import ObservationScratch
    from pheniqs_tpu.transform import SegmentBatch

    rng = np.random.default_rng(41)
    w = 8

    def serial(batches):
        buffer_code = np.zeros(w, dtype=np.uint8)
        buffer_qual = np.zeros(w, dtype=np.uint8)
        out = []
        for batch in batches:
            eff_c = np.zeros_like(batch.code)
            eff_q = np.zeros_like(batch.quality)
            for i in range(batch.code.shape[0]):
                l = int(batch.length[i])
                buffer_code[:l] = batch.code[i, :l]
                buffer_qual[:l] = batch.quality[i, :l]
                if l < w:
                    buffer_code[l] = 0
                    buffer_qual[l] = 0
                eff_c[i] = buffer_code
                eff_q[i] = buffer_qual
            out.append((eff_c.copy(), eff_q.copy()))
        return out, buffer_code.copy(), buffer_qual.copy()

    def make(lengths):
        n = len(lengths)
        code = rng.integers(1, 16, size=(n, w)).astype(np.uint8)
        qual = rng.integers(2, 42, size=(n, w)).astype(np.uint8)
        arange = np.arange(w)[None, :]
        lengths = np.asarray(lengths, dtype=np.int64)
        mask = arange < lengths[:, None]
        return SegmentBatch(
            code=np.where(mask, code, 0).astype(np.uint8),
            quality=np.where(mask, qual, 0).astype(np.uint8),
            length=lengths.astype(np.int32),
        )

    batches = [
        make([w] * 16),               # pure full-width -> fast path
        make([w, 3, w, 0, 5, w]),     # short reads read the carry
        make([w] * 4),                # fast path again, carry refreshed
        make([2]),                    # single short read
    ]
    want, want_carry_c, want_carry_q = serial(batches)

    scratch = ObservationScratch([w])
    for batch, (want_c, want_q) in zip(batches, want):
        got_c, got_q = scratch.effective(0, batch)
        np.testing.assert_array_equal(got_c, want_c)
        np.testing.assert_array_equal(got_q, want_q)
    np.testing.assert_array_equal(scratch.code[0], want_carry_c)
    np.testing.assert_array_equal(scratch.quality[0], want_carry_q)
