"""Pytest config: force an 8-device virtual CPU platform before jax import.

This mirrors how the multi-chip sharding path is validated without TPU
hardware (SURVEY.md §4: multi-host tests on CPU via
--xla_force_host_platform_device_count).
"""
import os

# Force-override: the environment may preset JAX_PLATFORMS to a TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# f32 matmuls on CPU are exact; on TPU the fields request HIGHEST explicitly.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The container's sitecustomize registers a TPU PJRT plugin at interpreter
# start, so the env var alone does not stick — force the platform here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference_oracle: parity test against the torch reference (skipped if absent)")
    config.addinivalue_line("markers", "slow: long-running training test")
