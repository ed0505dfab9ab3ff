import os
import sys

# Force a virtual 8-device CPU mesh for sharding tests; the real-TPU bench
# path sets its own platform. Must run before jax imports.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
