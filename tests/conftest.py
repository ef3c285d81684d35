"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by splitting the
host CPU into 8 XLA devices, per the framework's test strategy (SURVEY.md §4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a remote TPU backend and forces
# jax_platforms="axon,cpu" regardless of JAX_PLATFORMS; pin it back to cpu so
# the suite runs on the 8 virtual host devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("corpus",))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
