"""Test configuration.

Per the TPU-build ground rules, tests run JAX on a virtual 8-device CPU mesh
so sharding logic is exercised without real multi-chip hardware.  The env
vars must be set before the first ``import jax`` anywhere in the test
process, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from tnsh.core.params import setup_params  # noqa: E402


@pytest.fixture(scope="session")
def params3():
    return setup_params(3)


@pytest.fixture(scope="session")
def params4():
    return setup_params(4)
