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
                   help="directory to dump per-frame pose .mat files "
                        "(implies --full_pipeline)")
    p.add_argument("--full_pipeline", action="store_true",
                   help="BASELINE config 5: per-frame batched multi-object "
                        "estimation through masks (GT labels here; use "
                        "tools/train_segmentation.py output for SegNet masks)")
    p.add_argument("--posecnn_results", type=str, default="",
                   help="results_PoseCNN_RSS2018-style dir of %%06d.mat "
                        "segmentations to use as masks (reference eval_ycb "
                        "protocol; implies --full_pipeline)")
    p.add_argument("--device_pipeline", action="store_true",
                   help="run the full pipeline as ONE XLA program per "
                        "frame (plr2_tpu/serving.py: on-device bbox/crop/"
                        "preprocess + batched estimate; implies "
                        "--full_pipeline)")
    p.add_argument("--save_distances", type=str, default="",
                   help="write the per-object ADD-S distance report (JSON) "
                        "for offline curves via tools/plot_accuracy.py")
    p.add_argument("--plot", type=str, default="",
                   help="write the toolbox-style accuracy-vs-threshold "
                        "figure (PNG/SVG) directly from this run")
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-dispatch eval batch (1 = reference-faithful "
                        "per-crop mode; >1 pads crops onto a shared canvas "
                        "for throughput, numerically pinned equal by test)")
    p.add_argument("--num_points", type=int, default=None,
                   help="override the preset's sampled-cloud size (the "
                        "upstream driver's --num_points; default 1000)")
    p.add_argument("--mesh_points", type=int, default=None,
                   help="override the preset's model-mesh point count")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.save_mat or args.posecnn_results or args.device_pipeline:
        args.full_pipeline = True

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    import dataclasses

    from plr2_tpu.config import get_preset
    from plr2_tpu.data import YCBDataset, SyntheticPoseDataset
    from plr2_tpu.eval import evaluate
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import Trainer, CheckpointManager

    cfg = get_preset("ycb_refine")
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
        ds = SyntheticPoseDataset(num_frames=2, num_objects=3,
                                  model_points=cfg.dataset.num_mesh_points,
                                  num_points=cfg.model.num_points, seed=7)
    else:
        ds = YCBDataset(args.dataset_root, "test", cfg.model.num_points,
                        cfg.dataset.num_mesh_points, add_noise=False)

    if args.full_pipeline:
        from plr2_tpu.eval.full_pipeline import evaluate_full_pipeline

        if args.synthetic:
            frames = ds.frames
            models = {oid: m for oid, m in ds.models.items()}
        else:
            from plr2_tpu.eval.full_pipeline import ycb_frames_and_models
            frames, models = ycb_frames_and_models(ds, args.max_samples)
        seg_predict = None
        if args.posecnn_results:
            from plr2_tpu.data.posecnn import PoseCNNMasks
            seg_predict = PoseCNNMasks(args.posecnn_results)
            if (args.device_pipeline
                    and seg_predict.detections(0) is not None):
                print("note: --device_pipeline derives crop windows from "
                      "the predicted masks on device; the PoseCNN ROI-box "
                      "protocol (upstream get_bbox(posecnn_rois)) runs in "
                      "host mode — drop --device_pipeline for "
                      "protocol-identical config-5 numbers")
        res = evaluate_full_pipeline(
            pipe, state.variables, frames, models,
            sym_list=cfg.dataset.sym_list,
            refine_iterations=args.refine_iterations,
            seg_predict=seg_predict,
            save_mat_dir=args.save_mat,
            device_pipeline=args.device_pipeline)
        print(f"ADD-S AUC (<0.1 m): {res.auc:.2f}")
        print(f"ADD-S < 2 cm:       {res.under_2cm * 100:.2f}%")
        print(f"mean distance:      {res.mean_distance:.4f} m "
              f"({res.num_objects} objects / {res.num_frames} frames)")
        if res.lost_detections:
            print(f"lost detections (scored as failures): "
                  f"{res.lost_detections}")
        if res.extra_detections:
            print(f"extra detections (exported, not scored): "
                  f"{res.extra_detections}")
        if args.save_mat:
            print(f"per-frame poses written to {args.save_mat}")
        _report(args, res.per_object_distances)
        return

    res = evaluate(pipe, state.variables, ds,
                   sym_list=cfg.dataset.sym_list,
                   refine_iterations=args.refine_iterations,
                   max_samples=args.max_samples,
                   batch_size=args.batch_size)
    for obj, auc in sorted(res.per_object_auc.items()):
        print(f"object {obj:2d}: AUC {auc:6.2f}")
    print(f"ADD-S AUC (<0.1 m): {res.auc:.2f}")
    print(f"ADD-S < 2 cm:       {res.under_2cm * 100:.2f}%")
    print(f"mean distance:      {res.mean_distance:.4f} m "
          f"({res.num_samples} samples)")
    # evaluator keys distances by 0-based obj_idx; shift to the 1-based YCB
    # label ids the full-pipeline mode and .mat dumps use, so reports from
    # both modes name the same object the same way
    _report(args, {o + 1: d for o, d in res.per_object_distances.items()})


def _report(args, per_object_distances):
    if args.save_distances:
        from plr2_tpu.eval.report import save_distance_report
        save_distance_report(args.save_distances, per_object_distances,
                             meta={"dataset": "ycb",
                                   "object_ids": "ycb label ids (1-based)",
                                   "refine_iterations": args.refine_iterations})
        print(f"distance report written to {args.save_distances}")
    if args.plot:
        from plr2_tpu.eval.report import plot_accuracy_curves
        plot_accuracy_curves(per_object_distances, args.plot,
                             title="YCB-Video ADD-S accuracy vs threshold")
        print(f"accuracy curves written to {args.plot}")


if __name__ == "__main__":
    main()
