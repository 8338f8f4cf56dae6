"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Note: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
env var, so we must force the platform through jax.config before any
backend is initialized. XLA_FLAGS must also be set pre-init to get the
8 virtual CPU devices used by the sharding tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu"
    return devices
