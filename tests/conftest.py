"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md section 4, item 5)."""

import os

# This environment's sitecustomize imports jax at interpreter startup and pins
# JAX_PLATFORMS=axon (the single-real-TPU tunnel), so env vars set here are too
# late — the platform must be overridden through jax.config, and the host
# device-count flag must land before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


TEST_PLY = "/root/reference/data/test.ply"


@pytest.fixture(scope="session")
def test_ply_path():
    return TEST_PLY


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
