#!/usr/bin/env python
"""Training-step throughput with the chained-loop methodology.

tools/overfit_synthetic.py dispatches one step at a time, so through this
environment's relay its samples/s is bounded by the ~30-60 ms dispatch
latency, not compute (round-1's 507 samples/s at batch 32 = 63 ms/step
was exactly that bound). Here K optimizer steps run INSIDE one jitted
lax.fori_loop carrying (variables, opt_state) — the true on-device step
time — with null-program overhead subtracted.

  python tools/bench_train.py [batch] [--refine] [--bf16] [--fused]

--fused benches the exact-semantics fused accumulation window
(train/fused_accum.py) with window size = batch.
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


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 32
    refine = "--refine" in sys.argv
    phase = "--phase" in sys.argv
    remat = "--remat" in sys.argv
    bf16 = "--bf16" in sys.argv
    sym_slots = None
    for a in sys.argv[1:]:
        if a.startswith("--sym_slots="):
            sym_slots = int(a.split("=", 1)[1])
    inner, reps = 8, 3
    crop, n_points, num_objects = 160, 1000, 21

    fused = "--fused" in sys.argv

    from plr2_tpu.parallel import make_train_step
    from plr2_tpu.pipeline import DenseFusionPipeline

    pipe = DenseFusionPipeline(num_points=n_points, num_objects=num_objects,
                               phase_upsample=phase,
                               # the fused grad-scan needs the hand-derived
                               # phase backward to compile at crop 160
                               scan_safe_phase_vjp=(phase and fused),
                               dtype=jnp.bfloat16 if bf16 else jnp.float32)
    variables = pipe.init(jax.random.key(0), crop_hw=crop, batch=1)
    if fused:
        # exact per-sample accumulation semantics fused into one program
        # (train/fused_accum.py): batch = the accumulation window size
        import optax
        from plr2_tpu.train.fused_accum import make_fused_accum_step
        inner_step = make_fused_accum_step(
            pipe, sym_list=(0, 3), w=0.015, lr=1e-4,
            refine_iterations=2 if refine else 0)
        target = "refiner" if refine else "posenet"
        opt_state = optax.adam(1e-4).init(variables[target]["params"])

        def step(v, o, batch_data, key):
            return inner_step(v, o, batch_data,
                              jax.random.split(key, batch))
    else:
        init_fn, step_ = make_train_step(
            pipe, sym_list=(0, 3), w=0.015, lr=1e-4,
            refine_iterations=2 if refine else 0, remat=remat,
            sym_slots=sym_slots)
        opt_state = init_fn(variables)

        def step(v, o, batch_data, key):
            return step_(v, o, batch_data, key)

    ks = jax.random.split(jax.random.key(1), 5)
    batch_data = {
        "img": jax.random.normal(ks[0], (batch, crop, crop, 3), jnp.float32),
        "points": jax.random.normal(ks[1], (batch, n_points, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (batch, n_points), 0, crop * crop),
        "target": jax.random.normal(ks[3], (batch, 500, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (batch, 500, 3)) * 0.05,
        "idx": jnp.arange(batch, dtype=jnp.int32) % num_objects,
    }

    @jax.jit
    def loop(variables, opt_state, batch_data):
        # accumulate the per-step loss into the carry and return it —
        # returning a parameter leaf is NOT enough (the refine stage
        # freezes PoseNet, so a frozen leaf lets XLA delete the loop)
        def body(i, carry):
            v, o, acc = carry
            v, o, m = step(v, o, batch_data,
                           jax.random.fold_in(jax.random.key(7), i))
            return (v, o, acc + jnp.sum(m["loss"]))
        v, _, acc = jax.lax.fori_loop(
            0, inner, body, (variables, opt_state, jnp.float32(0)))
        # consume an updated leaf from BOTH nets so the final iteration's
        # backward/update cannot be dead-code-eliminated either
        tails = [jnp.asarray(jax.tree_util.tree_leaves(v[k])[0], jnp.float32
                             ).ravel()[0] for k in ("posenet", "refiner")]
        return acc + tails[0] + tails[1]

    @jax.jit
    def null_prog(x):
        return x["img"].ravel()[0] * 2.0

    np.asarray(loop(variables, opt_state, batch_data))
    np.asarray(null_prog(batch_data))
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(null_prog(batch_data))
    overhead = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(loop(variables, opt_state, batch_data))
    total = (time.perf_counter() - t0) / reps
    per_step = max(total - overhead, 1e-9) / inner
    print(f"train step (batch {batch}, refine={refine}, phase={phase}, "
          f"remat={remat}, sym_slots={sym_slots}, bf16={bf16}, "
          f"fused={fused}): "
          f"{per_step * 1e3:.2f} ms/step, "
          f"{batch / per_step:.1f} samples/s", flush=True)


if __name__ == "__main__":
    main()
