#!/usr/bin/env python
"""Pose-head micro-bench: find why the 3 MLP ladders run at ~24% MXU.

Variants (all consume every output; chained-loop methodology):
  3d        - ladders on (B, N, C) tensors as the model does
  2d        - same math on (B*N, C) reshaped once up front
  merged_l1 - one 1408->1920 level-1 matmul, then per-head ladders (2d)
  ladders_only - merged_l1 without the per-object select/gather tail
  single    - ONE ladder (r only) on 2d input: the lower bound x3

Run: python tools/bench_heads.py [batch]
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


def timed(fn, args, inner=10, reps=3):
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
    n_points, num_obj, dtype = 1000, 21, jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05,
                           dtype=dtype)

    dims = [(1408, 640), (640, 256), (256, 128)]
    heads = {}
    for tag, od in (("r", 4), ("t", 3), ("c", 1)):
        ws = [(mk((a, b)), mk((b,))) for a, b in dims]
        ws.append((mk((128, num_obj * od)), mk((num_obj * od,))))
        heads[tag] = ws

    feat3 = mk((batch, n_points, 1408))
    feat2 = feat3.reshape(batch * n_points, 1408)
    obj = jnp.arange(batch, dtype=jnp.int32) % num_obj

    def ladder(x, ws):
        for k, b in ws[:-1]:
            x = jax.nn.relu(x @ k + b)
        k, b = ws[-1]
        return x @ k + b

    def select(h, od):
        h = h.reshape(batch, n_points, num_obj, od)
        sel = jnp.broadcast_to(obj[:, None, None, None],
                               (batch, n_points, 1, od))
        return jnp.take_along_axis(h, sel, axis=2)[:, :, 0, :]

    def v_3d(feat3, prev):
        x = feat3 + prev
        outs = [select(ladder(x, heads[t]), od)[0, 0, 0]
                for t, od in (("r", 4), ("t", 3), ("c", 1))]
        return outs[0] + outs[1] + outs[2]

    def v_2d(feat2, prev):
        x = feat2 + prev
        outs = [select(ladder(x, heads[t]), od)[0, 0, 0]
                for t, od in (("r", 4), ("t", 3), ("c", 1))]
        return outs[0] + outs[1] + outs[2]

    kcat = jnp.concatenate([heads[t][0][0] for t in "rtc"], axis=1)
    bcat = jnp.concatenate([heads[t][0][1] for t in "rtc"], axis=0)

    def v_merged(feat2, prev):
        x = jax.nn.relu((feat2 + prev) @ kcat + bcat)
        outs = []
        for i, (t, od) in enumerate((("r", 4), ("t", 3), ("c", 1))):
            h = ladder(x[:, i * 640:(i + 1) * 640], heads[t][1:])
            outs.append(select(h, od)[0, 0, 0])
        return outs[0] + outs[1] + outs[2]

    def v_ladders_only(feat2, prev):
        x = jax.nn.relu((feat2 + prev) @ kcat + bcat)
        outs = []
        for i, t in enumerate("rtc"):
            h = ladder(x[:, i * 640:(i + 1) * 640], heads[t][1:])
            outs.append(h[0, 0])
        return outs[0] + outs[1] + outs[2]

    def v_single(feat2, prev):
        return ladder(feat2 + prev, heads["r"])[0, 0]

    rows = [("3d (model layout)", v_3d, (feat3,)),
            ("2d (B*N rows)", v_2d, (feat2,)),
            ("merged_l1", v_merged, (feat2,)),
            ("ladders_only (no select)", v_ladders_only, (feat2,)),
            ("single ladder (1/3 bound)", v_single, (feat2,))]
    for name, fn, args in rows:
        s = timed(fn, args)
        print(f"{name:28s} {s * 1e3:8.2f} ms/iter ({batch / s:9.1f} f/s)",
              flush=True)


if __name__ == "__main__":
    main()
