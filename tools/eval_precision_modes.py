#!/usr/bin/env python
"""Accuracy of the fast-inference modes vs the f32 reference-parity mode.

Loads the full-curriculum synthetic e2e checkpoint
(trained_models/synthetic_e2e, produced by tools/train_synthetic_e2e.py)
and runs the standard held-out eval protocol (ADD-S AUC / <2cm / mean
distance) under each pipeline configuration:

  f32            reference-parity mode
  f32+phase      phase-decomposed upsample (exact rewrite; sanity row)
  bf16           cast weights + bf16 compute (bench.py --no-phase)
  bf16+phase     the flagship bench.py default

  python tools/eval_precision_modes.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, default="trained_models/synthetic_e2e")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--test_frames", type=int, default=6)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    from plr2_tpu.data import SyntheticPoseDataset
    from plr2_tpu.eval import evaluate
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import CheckpointManager

    ckpt = CheckpointManager(args.ckpt)
    payload = ckpt.restore("best")
    if payload is None:
        print(f"no checkpoint at {args.ckpt} — run "
              "tools/train_synthetic_e2e.py first")
        return 1
    variables = payload["variables"]
    refine = bool(payload["meta"]["refine_started"])

    # held-out frames: same construction as train_synthetic_e2e.py
    test_ds = SyntheticPoseDataset(num_frames=args.test_frames, num_objects=2,
                                   model_points=256, num_points=500, seed=31)

    modes = [
        ("f32", dict(dtype=jnp.float32), False),
        ("f32+phase", dict(dtype=jnp.float32, phase_upsample=True), False),
        ("bf16", dict(dtype=jnp.bfloat16), True),
        ("bf16+phase", dict(dtype=jnp.bfloat16, phase_upsample=True), True),
    ]
    for name, kw, cast in modes:
        pipe = DenseFusionPipeline(num_points=500, num_objects=4, **kw)
        v = pipe.cast_variables(variables) if cast else variables
        res = evaluate(pipe, v, test_ds, sym_list=(0, 1, 2, 3),
                       refine_iterations=(2 if refine else 0),
                       diameters=test_ds.diameters)
        print(f"{name:11s} ADD-S AUC={res.auc:.2f}  "
              f"<2cm={res.under_2cm * 100:.1f}%  "
              f"mean_dis={res.mean_distance * 1000:.2f} mm  "
              f"success={res.mean_success * 100:.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
