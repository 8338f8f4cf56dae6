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


@pytest.fixture
def reference_stubs():
    """Properly-specced ftfy/regex/torchvision stubs for reference-oracle
    tests, removed after the test so nothing leaks into later modules."""
    from _stubs import install_reference_stubs, remove_reference_stubs

    install_reference_stubs()
    yield
    remove_reference_stubs()


# Every skip reason that is legitimate in THIS environment. Anything else
# (e.g. a leaked sys.modules stub breaking a reference-oracle import) fails
# the run instead of silently shrinking coverage.
EXPECTED_SKIP_PATTERNS = (
    "BERT weights unavailable offline",
    "reference tree absent",
    "no C++ compiler available",
    "perl or NIST script unavailable",
)

_unexpected_skips = []


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if report.skipped:
        reason = ""
        if isinstance(report.longrepr, tuple):
            reason = report.longrepr[2]
        else:
            reason = str(report.longrepr)
        if not any(p in reason for p in EXPECTED_SKIP_PATTERNS):
            _unexpected_skips.append((report.nodeid, reason))


def pytest_sessionfinish(session, exitstatus):
    if _unexpected_skips:
        lines = "\n".join(f"  {n}: {r}" for n, r in _unexpected_skips)
        print(f"\nERROR: unexpected skips (not in EXPECTED_SKIP_PATTERNS):\n{lines}")
        session.exitstatus = 1


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu"
    return devices
