#!/usr/bin/env python
"""Isolate the stage-1 loss composition (the round-4 adversarial pass on
the loss third — docs/PERF_NOTES.md "Round 4: stage-1 loss adversarial
pass" has the measured table):

  A. pose_loss fwd+bwd, sym_list=(0,3), sym_slots=8  (production)
  B. pose_loss fwd+bwd, sym_list=()                  (paired-ADD only, fused)
  C. OLD paired-ADD formulation (materialized (B,N,M,3) pred) fwd+bwd

B vs C measures what eliminating the hypothesis-tensor materialization
bought (1.50 -> 0.33 ms); A - B shows the production loss is ~99% the
K-slot ADD-S chamfer, which round-2's kernel attempts already measured
at ~80% of the brute-force d2 MXU floor (roofline closed).
Chained-loop methodology, batch 32, N=1000, M=500, v5e.
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
from plr2_tpu.losses.add_loss import pose_loss, transform_hypotheses

b, n, m = 32, 1000, 500
ks = jax.random.split(jax.random.key(0), 6)
pred_r = jax.random.normal(ks[0], (b, n, 4))
pred_t = jax.random.normal(ks[1], (b, n, 3)) * 0.01
pred_c = jax.nn.sigmoid(jax.random.normal(ks[2], (b, n, 1)))
target = jax.random.normal(ks[3], (b, m, 3)) * 0.05
model_points = jax.random.normal(ks[4], (b, m, 3)) * 0.05
points = jax.random.normal(ks[5], (b, n, 3)) * 0.1
idx = jnp.arange(b, dtype=jnp.int32) % 21


def old_paired_add(r, t, c):
    pred, rot, t_cand = transform_hypotheses(r, t, points, model_points)
    diff = pred - target[:, None, :, :]
    s = jnp.sum(diff * diff, axis=-1)
    pos = s > 0
    dis = jnp.mean(jnp.sqrt(jnp.where(pos, s, 1.0)) * pos, axis=-1)
    cc = c[..., 0]
    return jnp.mean(dis * cc - 0.015 * jnp.log(jnp.maximum(cc, 1e-12)))


def variant_loss(name):
    if name == "A":
        f = lambda r, t, c: pose_loss(r, t, c, target, model_points, idx,
                                      points, w=0.015, refine=False,
                                      sym_list=(0, 3), max_sym_slots=8).loss
    elif name == "B":
        f = lambda r, t, c: pose_loss(r, t, c, target, model_points, idx,
                                      points, w=0.015, refine=False,
                                      sym_list=()).loss
    else:
        f = old_paired_add
    return jax.grad(lambda args: f(*args))


def timed(fn, inner=8, reps=3):
    @jax.jit
    def loop(r, t, c):
        def body(i, carry):
            rr, acc = carry
            g = fn((rr, t, c))
            return (rr + g[0] * 1e-12,
                    acc + jnp.sum(g[1]) + jnp.sum(g[2]))
        rr, acc = jax.lax.fori_loop(0, inner, body, (r, jnp.float32(0)))
        return jnp.sum(rr) + acc

    @jax.jit
    def null_prog(r):
        return r.ravel()[0] * 2.0

    np.asarray(loop(pred_r, pred_t, pred_c)); np.asarray(null_prog(pred_r))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(pred_r))
    oh = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(loop(pred_r, pred_t, pred_c))
    tot = (time.perf_counter() - t0) / reps
    return max(tot - oh, 1e-9) / inner


for name, label in [("A", "sym(0,3) slots=8 [production]"),
                    ("B", "paired-ADD only (fused form)"),
                    ("C", "paired-ADD only (OLD materialized pred)")]:
    ms = timed(variant_loss(name)) * 1e3
    print(f"{name} {label:42s} {ms:7.2f} ms/step", flush=True)
