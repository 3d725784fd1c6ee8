"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests use a fake 8-device CPU mesh
(``--xla_force_host_platform_device_count``), as the CI host has at most one
real TPU chip. Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU boot shim force-sets jax_platforms at interpreter
# start, overriding JAX_PLATFORMS — undo it so tests run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout (for parity tests that load
    its pretrained checkpoint or run its torch modules as an oracle)."""
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT
