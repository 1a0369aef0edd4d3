"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path). Environment must be set before jax is imported anywhere.
"""
import os

# the axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
# plain env var is not enough — override through jax.config before any
# backend initialization
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REF_TEST = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REF_TEST.exists():
        pytest.skip("reference test fixtures not available")
    return REF_TEST

# persistent compilation cache keeps repeated test runs fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
