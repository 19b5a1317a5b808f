"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``), mirroring how the driver
validates the multi-chip path without real chips.
"""

import os

# Force CPU regardless of the ambient platform (the dev box exports
# JAX_PLATFORMS=axon for the tunneled TPU); HH_TEST_PLATFORM overrides.
os.environ["JAX_PLATFORMS"] = os.environ.get("HH_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
