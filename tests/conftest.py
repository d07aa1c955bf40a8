"""Test configuration: force CPU backend with 8 virtual devices so mesh /
pjit sharding tests run without TPU hardware (SURVEY.md section 4)."""

import os

# Must be set before jax initializes its backends. NOTE: this container's
# sitecustomize force-registers the `axon` TPU backend and overwrites
# JAX_PLATFORMS, so we must also override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
