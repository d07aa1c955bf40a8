"""Test configuration: force CPU backend with 8 virtual devices so mesh /
pjit sharding tests run without TPU hardware (SURVEY.md section 4)."""

import os

# Must be set before jax initializes its backends. NOTE: this container's
# sitecustomize force-registers the `axon` TPU backend and overwrites
# JAX_PLATFORMS, so we must also override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# On hosts with fewer CPUs than virtual devices the 8 per-device programs
# timeshare one core, so XLA's in-process collective rendezvous (default
# warn 20s / TERMINATE 40s) can kill the whole process while the slower
# devices are still queued — raise both timeouts. Verified on a 1-CPU box:
# test_parallel aborted at the 40s default and passes with this.
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent per-CPU-model compile cache: the suite is compile-dominated on
# small hosts; reruns on the same box skip most XLA compiles.
from plr2_tpu.utils.cache import enable_cpu_compilation_cache  # noqa: E402

enable_cpu_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Drop compiled executables between test modules.

    After ~160 accumulated in-process compiles the XLA CPU backend
    aborted/segfaulted twice during further compiles (observed on a 1-CPU
    125GB box at the same suite position on independent runs). Live
    executables hold fds/mappings/compiler state; clearing per module
    bounds that, and the persistent per-CPU disk cache makes any re-JIT
    of a shared program cheap."""
    yield
    jax.clear_caches()
