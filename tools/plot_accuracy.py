#!/usr/bin/env python
"""Offline accuracy curves + tables — the reference's MATLAB toolbox step
(replace_ycb_toolbox/plot_accuracy_keyframe.m + evaluate_poses_keyframe.m,
SURVEY.md section 2 #14) as an in-repo CLI.

Two input modes:

  # 1. a distance report saved by an eval run (--save_distances):
  python tools/plot_accuracy.py --distances report.json --out curves.png

  # 2. the toolbox workflow — recompute from per-frame pose .mat dumps
  #    (tools/eval_ycb.py --save_mat DIR) against ground truth:
  python tools/plot_accuracy.py --mat_dir DIR --synthetic --out curves.png
  python tools/plot_accuracy.py --mat_dir DIR --dataset_root YCB_ROOT ...

Prints the per-object AUC / <2cm / mean-distance table (plus 0.1*diameter
success when diameters are known), and optionally writes the curve figure
(--out) and a JSON table (--json).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--distances", type=str, default="",
                   help="distance-report JSON from an eval run")
    p.add_argument("--mat_dir", type=str, default="",
                   help="directory of %%06d.mat pose dumps to re-evaluate "
                        "against ground truth")
    p.add_argument("--dataset_root", type=str, default="",
                   help="YCB root for --mat_dir ground truth")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic fixture dataset as --mat_dir "
                        "ground truth (tests/smoke)")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--max_dist", type=float, default=0.1)
    p.add_argument("--out", type=str, default="",
                   help="write the accuracy-vs-threshold figure here")
    p.add_argument("--json", type=str, default="",
                   help="write the metric table as JSON here")
    p.add_argument("--title", type=str,
                   default="ADD(-S) accuracy vs threshold")
    args = p.parse_args()
    if bool(args.distances) == bool(args.mat_dir):
        p.error("pass exactly one of --distances / --mat_dir")

    import jax
    jax.config.update("jax_platforms", "cpu")

    from plr2_tpu.eval.report import (
        accuracy_table, distances_from_mat_dir, format_accuracy_table,
        load_distance_report, plot_accuracy_curves)

    diameters = None
    if args.distances:
        per_obj, meta = load_distance_report(args.distances)
        if meta.get("diameters"):
            diameters = {int(k): float(v)
                         for k, v in meta["diameters"].items()}
    else:
        from plr2_tpu.config import get_preset

        cfg = get_preset("ycb_refine")
        if args.synthetic:
            from plr2_tpu.data import SyntheticPoseDataset
            ds = SyntheticPoseDataset(
                num_frames=2, num_objects=3,
                model_points=cfg.dataset.num_mesh_points,
                num_points=cfg.model.num_points, seed=7)
            frames, models = ds.frames, dict(ds.models)
        else:
            if not args.dataset_root:
                p.error("--mat_dir needs --dataset_root or --synthetic")
            from plr2_tpu.data import YCBDataset
            from plr2_tpu.eval.full_pipeline import ycb_frames_and_models
            ds = YCBDataset(args.dataset_root, "test", cfg.model.num_points,
                            cfg.dataset.num_mesh_points, add_noise=False)
            frames, models = ycb_frames_and_models(ds, args.max_frames)
        per_obj = distances_from_mat_dir(args.mat_dir, frames, models,
                                         sym_list=cfg.dataset.sym_list)

    rows = accuracy_table(per_obj, diameters=diameters,
                          max_dist=args.max_dist)
    print(format_accuracy_table(rows))
    if args.json:
        os.makedirs(os.path.dirname(os.path.abspath(args.json)),
                    exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"table written to {args.json}")
    if args.out:
        plot_accuracy_curves(per_obj, args.out, max_dist=args.max_dist,
                             title=args.title)
        print(f"accuracy curves written to {args.out}")


if __name__ == "__main__":
    main()
