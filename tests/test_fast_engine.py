"""End-to-end `--fidelity fast` (device path) vs strict on BDGGG.

The fast engine must make identical classification decisions (RG
assignment, qcfail flags, corrected barcodes, channel routing) on the real
BDGGG workload; float confidence tags (XB/XM/XC) may differ within f32
tolerance of the strict f64 values.
"""

import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mux(reference_root, config, fidelity):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # run the subprocess on CPU: unsetting PALLAS_AXON_POOL_IPS keeps the
    # axon site hook from registering the TPU backend, and JAX_PLATFORMS
    # then selects the CPU client
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
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
            "--fidelity",
            fidelity,
        ],
        cwd=reference_root,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-4000:]
    return result


FLOAT_TAGS = ("XB:f:", "XM:f:", "XC:f:")


def split_tags(line):
    fields = line.rstrip("\n").split("\t")
    fixed, floats = [], {}
    for field in fields:
        if field[:5] in FLOAT_TAGS:
            floats[field[:5]] = float(field[5:])
        else:
            fixed.append(field)
    return fixed, floats


def test_fast_matches_strict_on_bdggg(reference_root, bdggg):
    config = os.path.join(bdggg, "BDGGG_annotated.json")
    strict = run_mux(reference_root, config, "strict")
    fast = run_mux(reference_root, config, "fast")

    strict_lines = strict.stdout.split("\n")
    fast_lines = fast.stdout.split("\n")
    assert len(strict_lines) == len(fast_lines)

    for s_line, f_line in zip(strict_lines, fast_lines):
        if s_line.startswith("@"):
            assert f_line.startswith("@")
            continue
        s_fixed, s_floats = split_tags(s_line)
        f_fixed, f_floats = split_tags(f_line)
        assert s_fixed == f_fixed, (s_line, f_line)
        assert set(s_floats) == set(f_floats)
        for tag, s_value in s_floats.items():
            f_value = f_floats[tag]
            assert math.isclose(s_value, f_value, rel_tol=5e-4, abs_tol=5e-6), (
                tag,
                s_value,
                f_value,
            )
