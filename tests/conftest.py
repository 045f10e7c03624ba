"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the JAX-native fake backend).

NOTE: this environment force-registers a remote 'axon' TPU backend via
sitecustomize and pins jax_platforms='axon,cpu'; plain JAX_PLATFORMS=cpu is
overridden, so we re-pin via jax.config AFTER import (backends are created
lazily, so this wins as long as no jax computation ran first).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
