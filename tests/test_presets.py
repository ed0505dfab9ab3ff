"""The bundled commercial barcode-set presets (presets/illumina/,
docs/recipe.md; reference docs/recipe.md + example/illumina/) must be
importable: every decoder in every preset compiles as the `base` of a
PAMLD sample decoder, and its codec is width-consistent."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESET_DIR = os.path.join(REPO, "presets", "illumina")


def preset_cases():
    for name in sorted(os.listdir(PRESET_DIR)):
        data = json.load(open(os.path.join(PRESET_DIR, name)))
        for decoder_name in data["decoder"]:
            yield name, decoder_name


CASES = list(preset_cases())


@pytest.mark.parametrize(
    "preset,decoder", CASES, ids=[f"{p}:{d}" for p, d in CASES],
)
def test_preset_decoder_compiles_as_base(tmp_path, preset, decoder):
    from pheniqs_tpu.config.compiler import InstructionCompiler

    data = json.load(open(os.path.join(PRESET_DIR, preset)))
    codec = data["decoder"][decoder]["codec"]
    widths = {
        tuple(len(segment) for segment in entry["barcode"])
        for entry in codec.values()
    }
    assert len(widths) == 1, f"{preset}:{decoder} mixes barcode widths"
    (width,) = widths

    token = [
        f"{s}:0:{length}" for s, length in enumerate(width)
    ]
    config = {
        "import": [os.path.join(PRESET_DIR, preset)],
        "input": [f"in_s{s + 1:02d}.fastq" for s in range(len(width))],
        "sample": {
            "base": decoder,
            "algorithm": "pamld",
            "transform": {"token": token},
        },
        "template": {"transform": {"token": ["0::"]}},
        "output": ["/dev/null"],
    }
    path = tmp_path / "job.json"
    path.write_text(json.dumps(config))
    compiler = InstructionCompiler(
        {"interactive": {"configuration url": str(path)}}
    )
    compiler.assemble()
    ontology = compiler.compile()
    compiled = ontology["sample"]
    # every codec entry became a barcode (+ undetermined at index 0)
    assert len(compiled["codec"]) == len(codec)
    assert compiled["algorithm"] == "pamld"
