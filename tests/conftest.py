"""Test configuration.

Tests run JAX on a virtual 8-device CPU mesh so sharding logic is exercised
without real multi-chip hardware.  NOTE: this image's axon sitecustomize
registers the TPU backend and overrides ``JAX_PLATFORMS`` env settings, so
forcing CPU requires ``jax.config.update('jax_platforms', 'cpu')`` after
import (before any backend initialization) — env vars alone are ignored.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if not os.environ.get("TNSH_NO_PERSISTENT_CACHE"):
    try:  # persistent XLA compile cache: big kernels compile once per machine
        jax.config.update("jax_compilation_cache_dir", "/tmp/tnsh_jax_cache")
    except Exception:
        pass

import pytest  # noqa: E402

from tnsh.core.params import setup_params  # noqa: E402


@pytest.fixture(scope="session")
def params3():
    return setup_params(3)


@pytest.fixture(scope="session")
def params4():
    return setup_params(4)
