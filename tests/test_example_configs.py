"""Config-compiler coverage over every bundled reference example vignette:
dual-index Illumina, fluidigm row/column cellular, sci-RNA-seq combinatorial
cellular + UMI, SPLiT-seq multi-round, ONT, cao_2017."""

import json
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: configs that require read feeds from the command line (they declare no
#: "input"; the reference fails identically without -i)
NEEDS_INPUT = {
    "CBJLFACXX_l01_row.json": 2,
}
#: decoder repositories imported by other configs, not runnable instructions
BASE_ONLY = {
    "CBJLFACXX_core.json",
    "H7LT2DSXX_core.json",
}


def compile_config(directory, name, inputs=0):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    argv = [
        sys.executable, "-m", "pheniqs_tpu.cli.main", "mux",
        "--config", name, "--compile", "--precision", "15",
    ]
    for i in range(inputs):
        argv.extend(["-i", f"synthetic_r{i + 1}.fastq"])
    return subprocess.run(
        argv, cwd=directory, env=env, capture_output=True, text=True, timeout=200
    )


def example_configs(reference_root):
    base = os.path.join(reference_root, "example")
    for root, _dirs, files in os.walk(base):
        relative = os.path.relpath(root, base)
        # depth-0 example dirs, plus the cao_2017 paper's real-world
        # sci-RNA-seq production configs one level deeper
        if relative.count(os.sep) > 0 and relative != os.path.join(
            "cao_2017", "pheniqs_config"
        ):
            continue
        for name in sorted(files):
            if not name.endswith(".json"):
                continue
            if any(
                tag in name
                for tag in ("report", "adjusted", "compiled", "static", "estimated")
            ):
                continue
            yield root, name


def test_all_example_configs_compile(reference_root):
    compiled = 0
    for directory, name in example_configs(reference_root):
        if name in BASE_ONLY:
            continue
        result = compile_config(directory, name, NEEDS_INPUT.get(name, 0))
        assert result.returncode == 0, (name, result.stderr[-1500:])
        document = json.loads(result.stdout)
        assert "input segment cardinality" in document, name
        compiled += 1
    assert compiled >= 15, compiled


def test_scirnaseq_combinatorial_cellular(reference_root):
    directory = os.path.join(reference_root, "example/scirnaseq_vignette")
    result = compile_config(directory, "HGGKLBGX2_l01_cellular.json")
    assert result.returncode == 0, result.stderr[-1500:]
    document = json.loads(result.stdout)
    cellular = document["cellular"]
    if isinstance(cellular, dict):
        cellular = [cellular]
    assert len(cellular) == 2  # two-round combinatorial indexing
    assert [len(c["codec"]) for c in cellular] == [96, 196]
    assert len(document["molecular"]) == 1  # UMI


def test_base_only_configs_fail_like_reference(reference_root):
    """Decoder-repository configs with no usable input must fail with a
    configuration error (exit 3, reference error.h:36), matching the reference's token
    validation (reference transcode.cpp:836-841)."""
    for directory, name in example_configs(reference_root):
        if name not in BASE_ONLY:
            continue
        result = compile_config(directory, name)
        assert result.returncode == 3, (name, result.returncode)
        assert "invalid input feed reference" in result.stderr
