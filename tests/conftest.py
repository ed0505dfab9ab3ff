import os
import sys

# Force a virtual 8-device CPU mesh for sharding tests; the real-TPU bench
# path sets its own platform. Must run before jax imports, and must OVERRIDE
# any inherited JAX_PLATFORMS (the driver environment pins the tunneled TPU,
# which has a single device and would break mesh tests). Set
# PHENIQS_TEST_TPU=1 to run the suite on real hardware instead.
if not os.environ.get("PHENIQS_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon site hook force-sets jax_platforms="axon,cpu" in jax.config
    # (ignoring the env var), so override the config itself; backends
    # initialize lazily, so this is effective as long as it runs before
    # the first jax.devices()/jit in the process
    import jax

    jax.config.update("jax_platforms", "cpu")

# the suite runs device fidelities on the CPU mesh by design: silence the
# CLI's cpu-backend performance warning (it would pollute stderr-parsed
# reports); a dedicated test re-enables it to assert it fires
os.environ.setdefault("PHENIQS_QUIET_CPU_DEVICE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repository not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def bdggg(reference_root):
    return os.path.join(reference_root, "test", "BDGGG")
