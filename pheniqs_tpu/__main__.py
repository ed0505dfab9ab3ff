"""`python -m pheniqs_tpu mux ...` — module entrypoint."""

import sys

from .cli.main import main

sys.exit(main(sys.argv))
