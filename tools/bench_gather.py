#!/usr/bin/env python
"""Choose-gather micro-bench: row-gather layout alternatives on TPU.

The PSP decoder ends by gathering N=1000 chosen pixels per sample from
the full-resolution embedding map. Gathered row width determines DMA
efficiency; trailing dims < 128 lanes tile poorly. Variants:

  narrow64   - take_along_axis from (B, 25600, 64): today's dense path
  grid64     - take from (B, 6400*4, 64): today's phase-grid path
  wide256    - take from (B, 6400, 256) + one-hot phase contraction
               (exact: the 4 phases sit contiguously in the 256 row)

Run: python tools/bench_gather.py [batch]
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


def timed(fn, args, inner=20, reps=3):
    @jax.jit
    def loop(*args):
        def body(i, prev):
            out = fn(*args, prev)
            return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-9
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    np.asarray(loop(*args))

    @jax.jit
    def null_prog(x):
        return jnp.asarray(x, jnp.float32).ravel()[0] * 2.0

    np.asarray(null_prog(args[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(args[0]))
    overhead = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(loop(*args))
    total = (time.perf_counter() - t0) / reps
    return max(total - overhead, 1e-9) / inner


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n, h, w, c = 1000, 80, 80, 64  # up_3 phase grid is 80x80x(2x2)x64
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(batch, h * w * 4, c)).astype(np.float32),
                       dtype=dtype)
    wide = grid.reshape(batch, h * w, 4 * c)
    choose = jnp.asarray(rng.integers(0, 4 * h * w, size=(batch, n)),
                         dtype=jnp.int32)
    big_w = 2 * w
    r = (choose // big_w).astype(jnp.int32)
    cc = (choose % big_w).astype(jnp.int32)
    flat = ((r // 2) * w + (cc // 2)) * 4 + (r % 2) * 2 + (cc % 2)
    low = (r // 2) * w + (cc // 2)
    phase = (r % 2) * 2 + (cc % 2)
    ph1 = jax.nn.one_hot(phase, 4, dtype=dtype)

    def v_grid64(grid, flat, prev):
        g = jnp.take_along_axis(grid + prev, flat[..., None], axis=1)
        return g[0, 0, 0]

    def v_wide256(wide, low, ph1, prev):
        g = jnp.take_along_axis(wide + prev, low[..., None], axis=1)
        g = g.reshape(batch, n, 4, c)
        out = jnp.einsum("bnpc,bnp->bnc", g, ph1)
        return out[0, 0, 0]

    rows = [("grid64 (B,25600,64)", v_grid64, (grid, flat)),
            ("wide256 (B,6400,256)+onehot", v_wide256, (wide, low, ph1))]
    for name, fn, args in rows:
        s = timed(fn, args)
        print(f"{name:30s} {s * 1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
