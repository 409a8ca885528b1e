"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-device sharding tests run against this virtual topology
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the build contract.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax at interpreter startup (to register
# the TPU plugin), which freezes jax_platforms before this file runs — update
# the live config too so tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference artifacts not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
