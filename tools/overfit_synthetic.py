#!/usr/bin/env python
"""Learning-dynamics check: overfit a small batch of synthetic frames and
report the ADD distance trajectory. Validates end-to-end gradients through
CNN + fusion + loss on real hardware (the reference has no equivalent
harness).

  python tools/overfit_synthetic.py --steps 300
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--num_points", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--refine_iterations", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision: bf16 network compute, f32 "
                        "params/optimizer/loss")
    p.add_argument("--crop", type=int, default=240,
                   help="stack_samples canvas size (crops must fit)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()
    import jax.numpy as jnp

    from plr2_tpu.data import SyntheticPoseDataset, raw_to_sample, stack_samples
    from plr2_tpu.parallel import make_train_step
    from plr2_tpu.pipeline import DenseFusionPipeline

    ds = SyntheticPoseDataset(num_frames=max(2, args.batch // 2),
                              num_objects=2, model_points=256,
                              num_points=args.num_points, seed=0)
    samples = [raw_to_sample(ds.get_raw(i % len(ds)), jax.random.key(i),
                             args.num_points) for i in range(args.batch)]
    batch_s = stack_samples(samples, crop=args.crop)
    batch = {"img": batch_s.img, "points": batch_s.points,
             "choose": batch_s.choose, "target": batch_s.target,
             "model_points": batch_s.model_points, "idx": batch_s.idx}

    pipe = DenseFusionPipeline(num_points=args.num_points, num_objects=4,
                               dtype=jnp.bfloat16 if args.bf16
                               else jnp.float32)
    variables = pipe.init(jax.random.key(0), crop_hw=80, batch=1)
    init_fn, step = make_train_step(
        pipe, sym_list=(), w=0.015, lr=args.lr,
        refine_iterations=args.refine_iterations)
    opt_state = init_fn(variables)

    t0 = time.time()
    for i in range(args.steps):
        variables, opt_state, m = step(variables, opt_state, batch,
                                       jax.random.key(i))
        if i % max(1, args.steps // 15) == 0 or i == args.steps - 1:
            print(f"step {i:4d}: loss={float(m['loss']):.5f} "
                  f"dis={float(m['dis']):.5f}", flush=True)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * args.batch / dt:.1f} samples/s)")


if __name__ == "__main__":
    main()
