"""Test configuration: force a virtual 8-device CPU mesh for all tests.

TPU hardware is exercised separately by bench.py and the driver; unit tests
must be hermetic and runnable anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU regardless of ambient config. The driver environment pre-sets
# JAX_PLATFORMS=axon (a tunneled TPU) AND its sitecustomize hook calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides env vars — so we must override the config itself, after jax
# import. Set DIETGPU_TEST_TPU=1 to opt in to running on real hardware.
if not os.environ.get("DIETGPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (heavy interpret-mode kernels, "
        "multi-process runtime)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process runtime, sweeps)"
    )


def pytest_collection_modifyitems(config, items):
    """Default tier skips `slow` tests so `pytest -q` stays fast on a plain
    CPU box; run the full tier with `pytest --runslow` (or RUN_SLOW=1)
    pre-commit. No coverage is lost — the slow tier contains the heavy
    interpret-mode kernel shapes and the multi-process runtime test."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
