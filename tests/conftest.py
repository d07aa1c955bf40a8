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

# Smoke tier: one fast test per subsystem, selected here centrally so the
# per-file sources stay marker-free. `pytest -m smoke` is the session
# liveness check (<5 min warm on the 1-CPU host; CLAUDE.md workflow).
_SMOKE_NODE_IDS = {
    # loss oracle
    "test_losses.py::test_pose_loss_matches_numpy_oracle[False]",
    # upstream-weight parity (torch mirror transplant)
    "test_torch_parity.py::test_posenet_forward_matches_torch_mirror",
    # serving / single-jit frame program
    "test_serving.py::test_frame_program_matches_host_chain",
    # one parallelism axis (dp train step on the 8-device mesh)
    "test_parallel.py::test_sharded_train_step_runs_and_matches_single_device",
    # one CLI subprocess
    "test_cli_smoke.py::test_eval_linemod_cli_synthetic",
    # geometry utils
    "test_geometry.py::test_quat_to_matrix_matches_scipy",
    # dataset plumbing
    "test_data.py::test_synthetic_frame_consistency",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("tests/")[-1]
        if rel in _SMOKE_NODE_IDS:
            item.add_marker(pytest.mark.smoke)


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
