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
