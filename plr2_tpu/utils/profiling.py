"""Profiling/tracing harness (SURVEY.md section 5.1 — the reference has
wall-clock prints only; the TPU build gets first-class tooling):

  * `trace(logdir)` — context manager around jax.profiler.trace; view the
    result in TensorBoard/Perfetto/XProf
  * `time_fn` — steady-state timing with block_until_ready and compile
    exclusion
  * `Timer` — the reference's lib/utils wall-clock logger equivalent
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/plr2_trace"):
    """Capture a device trace: `with trace('dir'): run_step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Compile + steady-state timing. Returns ms stats and items/s if the
    first argument has a leading batch dimension."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    res = {"compile_s": compile_s, "mean_ms": dt / iters * 1e3,
           "iters": float(iters)}
    if args and hasattr(args[0], "shape") and args[0].ndim > 0:
        res["items_per_s"] = args[0].shape[0] * iters / dt
    return res


class Timer:
    """Accumulating section timer for host-side loops."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0)
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1e3:.2f} "
                         f"ms/call ({n} calls)")
        return "\n".join(lines)
