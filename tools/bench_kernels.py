#!/usr/bin/env python
"""Honest kernel micro-benchmarks (chained on-device loops, host fetch;
see bench.py for why). Compares the Pallas kernels against their XLA
fallbacks at production shapes.

  python tools/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from plr2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timed_loop(make_body, carry0, inner=20, reps=3):
    """Run `inner` chained iterations in one dispatch; return s/iter."""

    @jax.jit
    def loop(carry0):
        return jax.lax.fori_loop(0, inner, make_body, carry0)

    fetch = lambda c: np.asarray(jax.tree_util.tree_leaves(c)[0]).ravel()[:4]  # noqa: E731
    fetch(loop(carry0))  # warm

    @jax.jit
    def null_prog(c):
        return jax.tree_util.tree_leaves(c)[0] * 1.0

    np.asarray(null_prog(carry0) if not isinstance(carry0, tuple)
               else null_prog(carry0[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(carry0) if not isinstance(carry0, tuple)
                   else null_prog(carry0[0]))
    overhead = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(reps):
        fetch(loop(carry0))
    total = (time.perf_counter() - t0) / reps
    return max(total - overhead, 1e-9) / inner


def bench_knn():
    from plr2_tpu.ops.pallas_knn import nn_distance_pallas
    from plr2_tpu.ops.knn import nn_distance_xla

    h, m, m2 = 1000, 500, 500
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(h, m, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(m2, 3)).astype(np.float32))

    def body_pallas(i, carry):
        d = nn_distance_pallas(pred + carry[0, 0] * 1e-12, target)
        return d

    def body_mxu(i, carry):
        d = nn_distance_pallas(pred + carry[0, 0] * 1e-12, target, mxu=True)
        return d

    def body_xla(i, carry):
        d = nn_distance_xla(pred + carry[0, 0] * 1e-12, target)
        return d

    carry0 = jnp.zeros((h, m))
    t_p = timed_loop(body_pallas, carry0, inner=100)
    t_m = timed_loop(body_mxu, carry0, inner=100)
    t_x = timed_loop(body_xla, carry0, inner=100)
    print(f"knn chamfer {h}x{m} vs {m2}: pallas-vpu {t_p * 1e3:.2f} ms | "
          f"pallas-mxu {t_m * 1e3:.2f} ms | xla {t_x * 1e3:.2f} ms | "
          f"mxu speedup vs xla {t_x / t_m:.1f}x")


def bench_head():
    from plr2_tpu.ops.pallas_fusion import fused_mlp_head

    rng = np.random.default_rng(0)
    params = tuple(
        (jnp.asarray((rng.normal(size=(ci, co)) / np.sqrt(ci)).astype(np.float32)),
         jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1))
        for ci, co in [(1408, 640), (640, 256), (256, 128), (128, 84)])
    x = jnp.asarray(rng.normal(size=(8000, 1408)).astype(np.float32))

    def xla_mlp(x):
        h = x
        for i, (w, b) in enumerate(params):
            h = jnp.dot(h, w, precision="highest") + b
            if i < 3:
                h = jnp.maximum(h, 0.0)
        return h

    def body_pallas(i, carry):
        return fused_mlp_head(x + carry[0, 0] * 1e-12, params, False)

    def body_xla(i, carry):
        return xla_mlp(x + carry[0, 0] * 1e-12)

    carry0 = jnp.zeros((8000, 84))
    t_p = timed_loop(body_pallas, carry0, inner=300)
    t_x = timed_loop(body_xla, carry0, inner=300)
    print(f"fused head 8000x1408 (f32): pallas {t_p * 1e3:.3f} ms | "
          f"xla-highest {t_x * 1e3:.3f} ms | speedup {t_x / t_p:.2f}x")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    bench_knn()
    bench_head()
