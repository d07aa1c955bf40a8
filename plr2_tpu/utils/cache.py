"""Persistent XLA compilation cache.

TPU compiles of the full pipeline take minutes through this environment's
remote-compile path; caching them on disk makes every subsequent process
(bench runs, CLIs, the driver) start in seconds. Safe to call multiple
times. The cache lives inside the repo (gitignored).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get("PLR2_JAX_CACHE", _DEFAULT)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return cache_dir


def enable_cpu_compilation_cache() -> str:
    """Persistent cache for CPU-backend compiles, keyed by the host CPU
    model+flags: CPU AOT artifacts use host ISA extensions, so a cache dir
    shared across heterogeneous VMs risks SIGILL — a per-CPU-tag dir is
    safe, and makes suite/dryrun reruns on the same host skip recompiles."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        # x86 spells these "model name"/"flags"; ARM "Processor"/"Features"/
        # "CPU part". If none match, fall back to the whole cpuinfo text —
        # volatile fields (cpu MHz) then churn the tag across boots, which
        # wastes cache but never aliases two ISAs to one dir.
        picked = [l for l in lines if l.startswith(
            ("model name", "flags", "Processor", "Features",
             "CPU implementer", "CPU part"))]
        key = platform.machine() + "\n".join(picked or lines)
        tag = hashlib.sha1(key.encode()).hexdigest()[:10]
    except OSError:
        tag = hashlib.sha1(
            (platform.machine() + platform.processor()).encode()
        ).hexdigest()[:10]
    env_root = os.environ.get("PLR2_JAX_CACHE")
    if env_root:
        return enable_compilation_cache(os.path.join(env_root, f"cpu_{tag}"))
    root = os.path.dirname(_DEFAULT)
    return enable_compilation_cache(
        os.path.join(root, f".jax_cache_cpu_{tag}"))
