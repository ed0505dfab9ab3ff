# Convenience targets (the package itself needs no build step: the native
# library self-compiles on first use). Mirrors the reference's make test
# entry point (reference Makefile:298-316).

PYTHON ?= python

.PHONY: all native test test-pure bench dryrun clean

all: native

native:
	$(PYTHON) -c "from pheniqs_tpu.native import load, build_error; \
	  lib = load(); \
	  assert lib is not None, build_error(); print('native library ok')"

test:
	JAX_PLATFORMS=cpu $(PYTHON) -m pytest tests/ -q

test-pure:
	JAX_PLATFORMS=cpu PHENIQS_NATIVE=0 $(PYTHON) -m pytest tests/ -q

dryrun:
	JAX_PLATFORMS=cpu $(PYTHON) -c "import __graft_entry__ as g; \
	  g.dryrun_multichip(8); print('dryrun ok')"

bench:
	$(PYTHON) bench.py

clean:
	rm -f pheniqs_tpu/native/libpheniqs_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
