"""`python -m pheniqs_tpu.cli.main mux ...` — the command-line entrypoint."""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    from ..job import run_job

    argv = list(sys.argv if argv is None else argv)
    if argv and argv[0].endswith(("main.py", "__main__.py")):
        # `python -m pheniqs_tpu` leaves the module path in argv[0];
        # normalize so @PG/CL lines carry the program name
        argv[0] = "pheniqs-tpu"
    return run_job(argv)


if __name__ == "__main__":
    sys.exit(main())


def entrypoint() -> int:
    """console_scripts shim: argv[0] becomes the installed binary name."""
    return main(sys.argv)
