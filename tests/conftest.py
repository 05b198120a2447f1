"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without a TPU. Pallas kernels run in interpreter mode on CPU;
sharding tests use the 8-device virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone does not win over an externally registered TPU plugin
# (JAX_PLATFORMS=axon in the session environment); force it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(100)
