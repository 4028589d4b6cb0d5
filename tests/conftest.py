"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

Multi-chip sharding behavior is tested on a host-platform device mesh
(`--xla_force_host_platform_device_count=8`), per the TPU-simulation pattern;
real-TPU benchmarking happens outside pytest (bench.py). Note: this
environment ships a TPU plugin that overrides the JAX_PLATFORMS env var, so
the platform is pinned through the config API, which takes precedence.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
    yield
