"""The instruction compiler must reproduce the reference's `--compile`
output byte for byte (test/BDGGG/valid/compile_*.out) when invoked with the
reference's exact argv."""

import os

import pytest

from pheniqs_tpu.cli.interface import Interface
from pheniqs_tpu.config.compiler import InstructionCompiler, write_compiled_instruction
from pheniqs_tpu.config.jsonkit import dtoa


def compile_config(reference_root, config, extra=()):
    cwd = os.getcwd()
    os.chdir(reference_root)
    try:
        argv = [
            "./pheniqs",
            "mux",
            "--config",
            config,
            "--precision",
            "15",
            *extra,
        ]
        interface = Interface(argv)
        operation = interface.operation()
        compiler = InstructionCompiler(operation)
        compiler.assemble()
        ontology = compiler.compile()
        return write_compiled_instruction(ontology, 15)
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("name", ["annotated", "interleave"])
def test_compile_matches_golden(reference_root, name):
    got = compile_config(
        reference_root, f"test/BDGGG/BDGGG_{name}.json", ("--compile",)
    )
    golden = open(
        os.path.join(reference_root, f"test/BDGGG/valid/compile_{name}.out")
    ).read()
    assert got + "\n" == golden


def test_dtoa_rapidjson_compatible():
    cases = [
        (0.18 * 0.985, "0.177299999999999"),
        (0.17 * 0.985, "0.16745"),
        (4.0**-8, "0.000015258789062"),
        (1.0, "1.0"),
        (244 / 248, "0.983870967741935"),
        (1e30, "1e30"),
        (1.5e30, "1.5e30"),
        (1e-30, "0.0"),
        (0.0, "0.0"),
        (100.0, "100.0"),
    ]
    for value, expected in cases:
        assert dtoa(value, 15) == expected, value


def test_inheritance_cycle_detection():
    from pheniqs_tpu.config.compiler import apply_repository_inheritance
    from pheniqs_tpu.errors import CommandLineError

    with pytest.raises(CommandLineError):
        apply_repository_inheritance(
            {"decoder": {"a": {"base": "b"}, "b": {"base": "a"}}}
        )
