#!/usr/bin/env python
"""Isolate the stage-1 training-step cost: model backward vs loss backward.

Variants (chained fori_loop, all grads consumed):
  posenet_fwd        - forward only (reference point)
  posenet_fwd_bwd    - grad of a plain mean over all PoseNet outputs
  loss_fwd_bwd       - grad of pose_loss wrt precomputed (r, t, c)
  full_step_fwd_bwd  - grad of pose_loss(posenet(...)) wrt params

  python tools/bench_train_parts.py [batch] [--bf16] [--sym_slots=K]
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


def timed(fn, args, inner=8, reps=3):
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


def tree_dot(t):
    return sum(jnp.sum(jnp.asarray(x, jnp.float32) ** 2)
               for x in jax.tree_util.tree_leaves(t))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 32
    bf16 = "--bf16" in sys.argv
    sym_slots = None
    for a in sys.argv[1:]:
        if a.startswith("--sym_slots="):
            sym_slots = int(a.split("=", 1)[1])
    crop, n_points, num_obj = 160, 1000, 21
    from plr2_tpu.losses import pose_loss
    from plr2_tpu.pipeline import DenseFusionPipeline

    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_obj,
                               phase_upsample=True,
                               dtype=jnp.bfloat16 if bf16 else jnp.float32)
    variables = pipe.init(jax.random.key(0), crop_hw=crop,
                          batch=1)["posenet"]
    ks = jax.random.split(jax.random.key(1), 5)
    img = jax.random.normal(ks[0], (batch, crop, crop, 3), jnp.float32)
    points = jax.random.normal(ks[1], (batch, n_points, 3)) * 0.1
    choose = jax.random.randint(ks[2], (batch, n_points), 0, crop * crop)
    obj = jnp.arange(batch, dtype=jnp.int32) % num_obj
    target = jax.random.normal(ks[3], (batch, 500, 3)) * 0.05
    model_points = jax.random.normal(ks[4], (batch, 500, 3)) * 0.05

    def fwd(v, im):
        return pipe.posenet.apply(v, im, points, choose, obj)

    def stage_fwd(img, prev):
        r, t, c, e = fwd(variables, img + prev)
        return r[0, 0, 0] + t[0, 0, 0] + c[0, 0, 0] + e[0, 0, 0]

    def stage_fwd_bwd(img, prev):
        def f(v):
            r, t, c, e = fwd(v, img + prev)
            return (jnp.mean(r) + jnp.mean(t) + jnp.mean(c) + jnp.mean(e))
        g = jax.grad(f)(variables)
        return tree_dot(g)

    r0, t0_, c0, _ = fwd(variables, img)

    def stage_loss(r0, t0_, c0, prev):
        def f(args):
            r, t, c = args
            out = pose_loss(r, t, c, target, model_points, obj, points,
                            w=0.015, refine=False, sym_list=(0, 3),
                            max_sym_slots=sym_slots)
            return out.loss
        val, g = jax.value_and_grad(f)((r0 + prev, t0_, c0))
        return val + tree_dot(g)

    def stage_full(img, prev):
        def f(v):
            r, t, c, e = fwd(v, img + prev)
            out = pose_loss(r, t, c, target, model_points, obj, points,
                            w=0.015, refine=False, sym_list=(0, 3),
                            max_sym_slots=sym_slots)
            return out.loss
        val, g = jax.value_and_grad(f)(variables)
        return val + tree_dot(g)

    # --- sub-model row: the encoder (PSPNet + choose-gather) alone, via a
    # standalone PSPNet carrying the posenet's nested "cnn" params ---
    from plr2_tpu.models.pspnet import PSPNet

    cnn = PSPNet(emb_dim=32, phase_upsample=pipe.posenet.phase_upsample,
                 dtype=pipe.posenet.dtype)
    cnn_vars = {"params": variables["params"]["cnn"],
                "batch_stats": variables["batch_stats"]["cnn"]}

    def stage_cnn_fwd(img, prev):
        return cnn.apply(cnn_vars, img + prev, choose=choose)[0, 0, 0]

    def stage_cnn_fwd_bwd(img, prev):
        g = jax.grad(lambda v: jnp.mean(
            cnn.apply(v, img + prev, choose=choose)))(cnn_vars)
        return tree_dot(g)

    rows = [("posenet_fwd", stage_fwd, (img,)),
            ("posenet_fwd_bwd(mean loss)", stage_fwd_bwd, (img,)),
            ("pspnet_fwd(cnn+gather)", stage_cnn_fwd, (img,)),
            ("pspnet_fwd_bwd(cnn+gather)", stage_cnn_fwd_bwd, (img,)),
            ("pose_loss_fwd_bwd(wrt r,t,c)", stage_loss, (r0, t0_, c0)),
            ("full_fwd_bwd(loss(model))", stage_full, (img,))]
    for name, fn, args in rows:
        s = timed(fn, args)
        print(f"{name:30s} {s * 1e3:8.2f} ms ({batch / s:9.1f} samples/s)",
              flush=True)


if __name__ == "__main__":
    main()
