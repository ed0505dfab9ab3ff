"""Full end-to-end golden test: `mux` on BDGGG_annotated.json must produce
byte-identical SAM (stdout) and JSON report (stderr) vs the reference
goldens, with @PG lines stripped exactly as the reference harness does
(reference test/function.sh:27-33)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mux(reference_root, config, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "pheniqs_tpu.cli.main",
            "mux",
            "--config",
            config,
            "--precision",
            "15",
            *extra,
        ],
        cwd=reference_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    return result


def strip_pg(text: str) -> str:
    return "\n".join(
        line for line in text.split("\n") if not line.startswith("@PG")
    )


def test_annotated_run_byte_identical(reference_root):
    result = run_mux(reference_root, "test/BDGGG/BDGGG_annotated.json")
    assert result.returncode == 0, result.stderr[:2000]
    golden_out = open(
        os.path.join(reference_root, "test/BDGGG/valid/annotated.out")
    ).read()
    golden_err = open(
        os.path.join(reference_root, "test/BDGGG/valid/annotated.err")
    ).read()
    assert strip_pg(result.stdout) == strip_pg(golden_out)
    assert result.stderr == golden_err


def test_validate_annotated_byte_identical(reference_root):
    result = run_mux(
        reference_root,
        "test/BDGGG/BDGGG_annotated.json",
        extra=("--validate", "--distance"),
    )
    assert result.returncode == 0, result.stderr[:2000]
    golden = open(
        os.path.join(reference_root, "test/BDGGG/valid/validate_annotated.out")
    ).read()
    assert result.stdout == golden
    assert result.stderr == ""


def test_validate_interleave_byte_identical(reference_root):
    result = run_mux(
        reference_root,
        "test/BDGGG/BDGGG_interleave.json",
        extra=("--validate",),
    )
    assert result.returncode == 0, result.stderr[:2000]
    golden = open(
        os.path.join(reference_root, "test/BDGGG/valid/validate_interleave.out")
    ).read()
    assert result.stdout == golden


def test_annotated_run_pure_python_fallback(reference_root):
    """PHENIQS_NATIVE=0 forces every pure-Python fallback path; the run
    must still be byte-identical."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    env["PHENIQS_NATIVE"] = "0"
    result = subprocess.run(
        [
            sys.executable, "-m", "pheniqs_tpu.cli.main", "mux",
            "--config", "test/BDGGG/BDGGG_annotated.json",
            "--precision", "15",
        ],
        cwd=reference_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr[:2000]
    golden = open(
        os.path.join(reference_root, "test/BDGGG/valid/annotated.out")
    ).read()
    assert strip_pg(result.stdout) == strip_pg(golden)
