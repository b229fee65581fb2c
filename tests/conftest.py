"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU mesh (the standard JAX pattern).  float64 is enabled
globally — the parity path requires it; fp32 paths request their dtype
explicitly.

Platform forcing is done via ``jax.config.update("jax_platforms", "cpu")``,
NOT via the ``JAX_PLATFORMS`` environment variable: some environments
pre-register an ambient TPU platform plugin that ignores the env var, which
would silently run every "multi-device" test on a single real chip.  The
asserts below make that failure mode loud instead of vacuous.
"""

import os

_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", (
    "test suite requires the CPU platform but got %r — platform forcing ran "
    "after JAX initialized a backend" % jax.default_backend())
assert len(jax.devices()) == 8, (
    "test suite requires 8 virtual CPU devices but got %d — "
    "xla_force_host_platform_device_count was not honored"
    % len(jax.devices()))

# (Reference-checkout detection lives in tests/test_parity.py, the only
# consumer.)
