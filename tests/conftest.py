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


@pytest.fixture
def rng():
    return np.random.default_rng(42)
