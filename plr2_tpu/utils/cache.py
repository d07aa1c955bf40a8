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


def cpu_cache_tag(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """Stable tag for the host CPU's model+ISA, used to key the CPU-backend
    compile cache dir: CPU AOT artifacts bake in host ISA extensions, so a
    dir shared across heterogeneous VMs risks SIGILL; distinct CPUs must
    map to distinct tags (pinned by test)."""
    import hashlib
    import platform

    try:
        with open(cpuinfo_path) as f:
            lines = f.read().splitlines()
        # x86 spells these "model name"/"flags" (+ vendor/family/model/
        # stepping — LLVM derives TUNING features like prefer-no-gather
        # from the CPUID triple, not from the flag list, so two VMs with
        # identical model-name+flags but different steppings must not
        # alias. NOTE: the cpu_aot_loader "target machine feature ...
        # not supported on the host" warning does NOT by itself indicate
        # aliasing — it fires even when loading artifacts compiled in the
        # SAME boot on the SAME host (verified round 3: all cache files
        # newer than boot, warnings still printed), because the runtime
        # host-feature probe reports ISA bits only, never the tuning
        # prefs the compile-time target string embeds. Benign unless the
        # mismatching features are real ISA bits); ARM "Processor"/
        # "Features"/"CPU part"/variant/revision. If none match, fall back
        # to the whole cpuinfo text — volatile fields (cpu MHz) then churn
        # the tag across boots, which wastes cache but never aliases two
        # ISAs to one dir.
        picked = [l for l in lines if l.startswith(
            ("vendor_id", "cpu family", "model", "stepping", "flags",
             "Processor", "Features", "CPU implementer", "CPU part",
             "CPU variant", "CPU revision"))]
        key = platform.machine() + "\n".join(picked or lines)
        return hashlib.sha1(key.encode()).hexdigest()[:10]
    except OSError:
        return hashlib.sha1(
            (platform.machine() + platform.processor()).encode()
        ).hexdigest()[:10]


def enable_cpu_compilation_cache() -> str:
    """Persistent cache for CPU-backend compiles in a per-CPU-tag dir (see
    cpu_cache_tag); makes suite/dryrun reruns on the same host skip
    recompiles without aliasing artifacts across heterogeneous VMs."""
    tag = cpu_cache_tag()
    env_root = os.environ.get("PLR2_JAX_CACHE")
    if env_root:
        return enable_compilation_cache(os.path.join(env_root, f"cpu_{tag}"))
    root = os.path.dirname(_DEFAULT)
    return enable_compilation_cache(
        os.path.join(root, f".jax_cache_cpu_{tag}"))
