"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU mesh (the standard JAX pattern).  float64 is enabled
globally — the parity path requires it; fp32 paths request their dtype
explicitly.
"""

import os

# Force-assign (the ambient environment may point JAX_PLATFORMS at real TPU
# hardware; tests must be deterministic on the virtual CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_available():
    return os.path.isdir(REFERENCE)
