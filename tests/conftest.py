"""Test configuration: force CPU with 8 virtual devices.

Multi-chip logic is validated on a fake CPU mesh (the standard JAX substitute
for a cluster); kernels are validated in interpret/XLA-CPU mode. Must run
before jax initializes its backends, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is overridden by the site's axon plugin config; the
# config update is authoritative and must land before first backend use.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
