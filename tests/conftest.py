"""Test harness config: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding is validated on virtual CPU devices exactly as the driver's
dryrun does (no TPU needed to run the suite).
"""

import os

# Hard-set (the session env pins JAX_PLATFORMS=axon for the tunneled TPU chip;
# the unit suite must run on virtual CPU devices).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
