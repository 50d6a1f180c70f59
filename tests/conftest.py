"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-device mesh/pjit code paths are exercised without TPU hardware.

NOTE: this environment preloads jax via sitecustomize (axon TPU plugin), so
the JAX_PLATFORMS env var is captured before conftest runs — we must use
jax.config.update instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
