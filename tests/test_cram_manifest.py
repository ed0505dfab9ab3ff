"""The externally verifiable CRAM fixture set (tests/data/cram_manifest/)
must regenerate byte-identically and match its MANIFEST.json sha256s.

The checked-in fixtures are what an external machine with samtools
validates against htslib (docs/cram_validation.md); this test pins that
the generator still produces exactly those bytes, so the manifest's
hashes keep describing the writer's current behavior."""

import json
import os

import pytest

FIXTURES = os.path.join(
    os.path.dirname(__file__), "data", "cram_manifest"
)


@pytest.fixture(scope="module")
def regenerated(tmp_path_factory):
    from pheniqs_tpu.tools.cram_manifest import generate

    outdir = tmp_path_factory.mktemp("cram_manifest")
    manifest = generate(str(outdir))
    return str(outdir), manifest


def test_fixture_files_regenerate_byte_identical(regenerated):
    from pheniqs_tpu.tools.cram_manifest import zlib_canary

    with open(os.path.join(FIXTURES, "MANIFEST.json")) as stream:
        manifest = json.load(stream)
    if manifest["zlib_canary_sha256"] != zlib_canary():
        pytest.skip(
            "different zlib build: gzip bytes are deterministic per "
            "build, not across builds — the SAM-truth and manifest-hash "
            "tests still gate correctness"
        )
    outdir, _ = regenerated
    names = sorted(os.listdir(FIXTURES))
    assert sorted(os.listdir(outdir)) == names
    for name in names:
        if name == "MANIFEST.json":
            continue
        with open(os.path.join(FIXTURES, name), "rb") as stream:
            want = stream.read()
        with open(os.path.join(outdir, name), "rb") as stream:
            got = stream.read()
        assert got == want, f"{name} drifted from the checked-in fixture"


def test_manifest_hashes_match_fixtures(regenerated):
    from pheniqs_tpu.tools.cram_manifest import sha256

    with open(os.path.join(FIXTURES, "MANIFEST.json")) as stream:
        manifest = json.load(stream)
    assert manifest["files"], "manifest lists no files"
    for name, meta in manifest["files"].items():
        path = os.path.join(FIXTURES, name)
        assert sha256(path) == meta["sha256"], name
        assert os.path.getsize(path) == meta["bytes"], name


def test_manifest_carries_external_validation_commands():
    with open(os.path.join(FIXTURES, "MANIFEST.json")) as stream:
        manifest = json.load(stream)
    commands = manifest["external_validation"]
    assert any("quickcheck" in c for c in commands)
    # every CRAM fixture has a samtools view diff against its SAM truth
    for name in manifest["files"]:
        if name.endswith(".cram"):
            stem = name[:-5]
            assert any(
                name in c and f"{stem}.sam" in c for c in commands
            ), name


def test_sam_truth_matches_reader_decode(regenerated):
    """The checked-in SAM truths are what our reader decodes from the
    checked-in CRAMs — the htslib diff in docs/cram_validation.md then
    validates reader AND writer against samtools in one step."""
    from pheniqs_tpu.tools.cram_manifest import render_sam

    for stem, reference in (
        ("unmapped_demux", None),
        ("mapped_mixed", os.path.join(FIXTURES, "ref.fa")),
        ("batch_columnar", None),
    ):
        got = render_sam(
            os.path.join(FIXTURES, f"{stem}.cram"), reference
        )
        with open(os.path.join(FIXTURES, f"{stem}.sam")) as stream:
            assert got == stream.read(), stem
