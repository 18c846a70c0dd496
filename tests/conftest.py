"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware.

The sandbox's sitecustomize pre-imports jax with a TPU ('axon') backend
selected via env, so env-var overrides alone are ignored; we must use
jax.config.update before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run @pytest.mark.slow tests (the full lane; default lane "
             "skips them to keep `pytest -q` under ~8 min)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long end-to-end test — runs with --runslow or RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow test: pass --runslow (or RUN_SLOW=1) for the full lane"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
