#!/usr/bin/env python
"""LineMOD evaluation CLI — the reference's tools/eval_linemod.py protocol:
per-object ADD(-S) < 0.1*diameter success rates (SURVEY.md section 3.3)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--model", type=str, default="",
                   help="checkpoint directory (CheckpointManager tag 'best')")
    p.add_argument("--refine_iterations", type=int, default=4)
    p.add_argument("--segnet_results", type=str, default="",
                   help="directory of predicted masks in the upstream "
                        "layout {dir}/{obj:02d}_label/{frame:04d}_label.png "
                        "(the reference eval's segnet_results/); empty = GT "
                        "masks. Generate with tools/segment_linemod.py.")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--save_distances", type=str, default="",
                   help="write the per-object ADD(-S) distance report "
                        "(JSON) for offline curves via tools/plot_accuracy.py")
    p.add_argument("--plot", type=str, default="",
                   help="write the accuracy-vs-threshold figure (PNG/SVG)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-dispatch eval batch (1 = reference-faithful "
                        "per-crop mode; >1 pads crops onto a shared canvas "
                        "for throughput, numerically pinned equal by test)")
    p.add_argument("--num_points", type=int, default=None,
                   help="override the preset's sampled-cloud size (the "
                        "upstream driver's --num_points; default 500)")
    p.add_argument("--mesh_points", type=int, default=None,
                   help="override the preset's model-mesh point count")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    import dataclasses

    from plr2_tpu.config import get_preset
    from plr2_tpu.data import LinemodDataset, SyntheticPoseDataset
    from plr2_tpu.eval import evaluate
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import Trainer, CheckpointManager

    cfg = get_preset("linemod_train")
    if args.num_points or args.mesh_points:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                num_points=args.num_points or cfg.model.num_points),
            dataset=dataclasses.replace(
                cfg.dataset,
                num_points=args.num_points or cfg.dataset.num_points,
                num_mesh_points=(args.mesh_points
                                 or cfg.dataset.num_mesh_points)))
    pipe = DenseFusionPipeline(num_points=cfg.model.num_points,
                               num_objects=cfg.model.num_objects,
                               use_pallas=cfg.model.use_pallas_model,
                               phase_upsample=cfg.model.phase_upsample)
    trainer = Trainer(cfg, pipe)
    state = trainer.init_state(jax.random.key(0))
    if args.model:
        state = CheckpointManager(args.model).restore_into(state)
        print(f"loaded checkpoint (epoch {state.epoch})")

    if args.synthetic:
        ds = SyntheticPoseDataset(num_frames=2, num_objects=2,
                                  model_points=cfg.dataset.num_mesh_points,
                                  num_points=cfg.model.num_points, seed=42)
        diameters = ds.diameters
    else:
        ds = LinemodDataset(args.dataset_root, "test", cfg.model.num_points,
                            cfg.dataset.num_mesh_points, add_noise=False,
                            segnet_results=args.segnet_results or None)
        diameters = {ds.objlist.index(o): d for o, d in ds.diameters.items()}

    res = evaluate(pipe, state.variables, ds,
                   sym_list=cfg.dataset.sym_list,
                   refine_iterations=args.refine_iterations,
                   diameters=diameters, max_samples=args.max_samples,
                   batch_size=args.batch_size)
    for obj, s in sorted(res.per_object_success.items()):
        print(f"object {obj:2d}: success {s * 100:.2f}%")
    print(f"mean success rate: {res.mean_success * 100:.2f}%  "
          f"(mean dis {res.mean_distance:.4f} m, {res.num_samples} samples)")
    if res.lost_detections:
        print(f"lost detections (empty predicted mask, skipped): "
              f"{res.lost_detections}")
    if args.save_distances:
        from plr2_tpu.eval.report import save_distance_report
        save_distance_report(
            args.save_distances, res.per_object_distances,
            meta={"dataset": "linemod",
                  "refine_iterations": args.refine_iterations,
                  "diameters": {int(k): float(v)
                                for k, v in diameters.items()}})
        print(f"distance report written to {args.save_distances}")
    if args.plot:
        from plr2_tpu.eval.report import plot_accuracy_curves
        plot_accuracy_curves(res.per_object_distances, args.plot,
                             title="LineMOD ADD(-S) accuracy vs threshold")
        print(f"accuracy curves written to {args.plot}")


if __name__ == "__main__":
    main()
