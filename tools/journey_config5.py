#!/usr/bin/env python
"""The complete config-5 journey as ONE reproducible script (VERDICT r4
missing #2 / next-round #1): train -> segment -> serve/eval -> report at
YCB scale on synthetic scenes.

Chain (BASELINE.json config 5; the upstream equivalent is
tools/train.py -> vanilla_segmentation/train.py -> tools/eval_ycb.py ->
replace_ycb_toolbox [upstream, mount empty]):

  1. a FIXED 21-object model library (symmetric subset = plain cuboids
     scored ADD-S at the real YCB symmetric indices 12/15/18/19/20;
     everything else knobbed-asymmetric so ADD is well-posed), rendered
     into multi-object scenes with persistent object identities
     (data/synthetic.make_model_library, data/loader.SyntheticSceneDataset);
  2. PoseNet + refiner trained with the batched trainer (BatchTrainer)
     at 1000 points / 160-crop buckets through BOTH curriculum switches
     (decay 0.016, joint refine 0.013), best checkpoint saved;
  3. SegNet trained on the same frames (train/seg_trainer.py);
  4. held-out full-pipeline evaluation with SEGNET-PREDICTED masks +
     4-iteration refinement, per-frame .mat pose export
     (eval/full_pipeline.py);
  5. the offline toolbox step: re-evaluate the .mat dump against ground
     truth, print the per-object accuracy table, write curves + report
     (eval/report.py — the replace_ycb_toolbox equivalent).

Full scale (defaults):   python tools/journey_config5.py
Shrunk scale (pinned by tests/test_journey_config5.py):
  python tools/journey_config5.py --objects 3 --sym 2 --train_frames 6 \
      --test_frames 2 --per_frame 2 --num_points 96 --model_points 128 \
      --batch 4 --epochs 2 --seg_epochs 2 --force_switches --cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--objects", type=int, default=21)
    p.add_argument("--sym", type=int, default=-1,
                   help="-1: the YCB symmetric subset {13,16,19,20,21} "
                        "(1-based); N: the last N object ids")
    p.add_argument("--train_frames", type=int, default=160)
    p.add_argument("--test_frames", type=int, default=24)
    p.add_argument("--per_frame", type=int, default=5,
                   help="objects rendered per scene")
    p.add_argument("--num_points", type=int, default=1000)
    p.add_argument("--model_points", type=int, default=500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--repeat_epoch", type=int, default=2)
    p.add_argument("--seg_epochs", type=int, default=24)
    p.add_argument("--seg_batch", type=int, default=4)
    p.add_argument("--refine_iterations", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--outf", type=str, default="trained_models/journey_c5")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--decay_margin", type=float, default=0.016)
    p.add_argument("--refine_margin", type=float, default=0.013,
                   help="the reference thresholds are sized to real-data "
                        "difficulty; size them to the synthetic task "
                        "(README status table, e2e precedent) so the "
                        "switch MECHANISM is exercised at a reachable "
                        "operating point")
    p.add_argument("--resume", action="store_true",
                   help="resume posenet training from <outf>/best")
    p.add_argument("--distinct_colors", action="store_true",
                   help="well-separated object palette (YCB objects are "
                        "visually distinct; the default id-hash colors "
                        "have near-collision pairs that cap segmentation "
                        "identity accuracy — measured round 5). NOT "
                        "checkpoint-compatible with runs trained on the "
                        "default palette")
    p.add_argument("--force_switches", action="store_true",
                   help="set both curriculum margins to +inf so the decay "
                        "and refine switches fire on the first test epochs "
                        "— exercises the full stage chain at tiny scale "
                        "(the shrunk-scale test)")
    return p.parse_args(argv)


def build_datasets(args):
    from plr2_tpu.data import SyntheticSceneDataset
    from plr2_tpu.data.synthetic import make_model_library

    if args.sym < 0:
        sym_ids = tuple(i for i in (13, 16, 19, 20, 21) if i <= args.objects)
    else:
        sym_ids = tuple(range(args.objects - args.sym + 1, args.objects + 1))
    models = make_model_library(args.objects, args.model_points,
                                seed=args.seed, sym_ids=sym_ids)
    train_ds = SyntheticSceneDataset(models, args.train_frames,
                                     objects_per_frame=args.per_frame,
                                     num_points=args.num_points,
                                     seed=args.seed,
                                     distinct_colors=args.distinct_colors)
    # different seed streams -> novel poses/compositions of the SAME
    # library. The VAL set gates curriculum/model selection during fit;
    # the TEST set is only ever touched by the final full-pipeline eval
    # (train_synthetic_e2e's disjoint --test_seed discipline).
    val_ds = SyntheticSceneDataset(models, max(2, args.test_frames // 2),
                                   objects_per_frame=args.per_frame,
                                   num_points=args.num_points,
                                   seed=args.seed + 57,
                                   distinct_colors=args.distinct_colors)
    test_ds = SyntheticSceneDataset(models, args.test_frames,
                                    objects_per_frame=args.per_frame,
                                    num_points=args.num_points,
                                    seed=args.seed + 31,
                                    distinct_colors=args.distinct_colors)
    sym_list = tuple(i - 1 for i in sym_ids)  # 0-based
    return models, train_ds, val_ds, test_ds, sym_list


def train_posenet(args, train_ds, val_ds, sym_list, log):
    import jax

    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.train import BatchTrainer, CheckpointManager

    inf = float("inf")
    cfg = PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=args.num_points,
                              num_objects=args.objects,
                              num_mesh_points=args.model_points,
                              sym_list=sym_list),
        model=ModelConfig(num_points=args.num_points,
                          num_objects=args.objects),
        train=TrainConfig(batch_size=args.batch, lr=args.lr,
                          nepoch=args.epochs,
                          repeat_epoch=args.repeat_epoch,
                          decay_margin=(inf if args.force_switches
                                        else args.decay_margin),
                          refine_margin=(inf if args.force_switches
                                         else args.refine_margin)))
    trainer = BatchTrainer(cfg)
    state = trainer.init_state(jax.random.key(args.seed))
    ckpt = CheckpointManager(args.outf)
    if args.resume:
        state = ckpt.restore_into(state, "best")
        log(f"resumed from {args.outf}/best: epoch {state.epoch}, "
            f"best={state.best_test:.5f}, refine={state.refine_started}")
    state = trainer.fit(
        state, train_ds, val_ds, jax.random.key(args.seed + 1),
        epochs=args.epochs, log_fn=log,
        checkpoint_fn=lambda s, d: ckpt.save(s, d),
        save_last_fn=lambda s: ckpt.save(s, s.best_test, tag="last"))
    if not state.refine_started:
        log("WARNING: the refine switch never fired — metrics below are "
            "stage-1/decay only")
    # evaluate the BEST checkpoint, like the reference eval drivers
    best = ckpt.restore_into(trainer.init_state(jax.random.key(0)), "best")
    return trainer, state, best


def train_segnet(args, train_ds, test_ds, log):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plr2_tpu.train.seg_trainer import SegTrainer

    seg = SegTrainer(num_classes=args.objects + 1, crop=128,
                     batch=args.seg_batch)
    st = seg.init_state(jax.random.key(args.seed + 2))
    for e in range(args.seg_epochs):
        st = seg.train_epoch(st, train_ds.frames, seed=args.seed * 100 + e)
        log(f"segnet epoch {e + 1}: loss={st['last_epoch_loss']:.4f} "
            f"({st['seconds']:.1f}s)")
    from plr2_tpu.train.checkpoint import save_variables

    save_variables(os.path.join(args.outf, "segnet.msgpack"),
                   st["variables"])
    # held-out pixel accuracy on full frames (pad-to-32 predict path)
    accs = []
    for fr in test_ds.frames[:8]:
        norm = (jnp.asarray(fr.color[None], jnp.float32) / 255.0 - 0.5) / 0.5
        pred = np.asarray(seg.predict(st["variables"], norm)[0])
        accs.append(float((pred == fr.label).mean()))
    log(f"segnet held-out full-frame pixel acc: {np.mean(accs):.4f}")
    return seg, st, float(np.mean(accs))


def eval_full_pipeline(args, pipe, variables, test_ds, sym_list, seg, seg_st,
                       log):
    from plr2_tpu.eval.full_pipeline import (evaluate_full_pipeline,
                                             segment_frame)

    mat_dir = os.path.join(args.outf, "mat")
    res = evaluate_full_pipeline(
        pipe, variables, test_ds.frames, dict(test_ds.models),
        sym_list=sym_list, refine_iterations=args.refine_iterations,
        seg_predict=lambda color: segment_frame(seg, seg_st, color),
        num_points=args.num_points, save_mat_dir=mat_dir)
    log(f"full pipeline (SegNet masks, {args.refine_iterations}-iter "
        f"refine): ADD-S AUC={res.auc:.2f} <2cm={res.under_2cm * 100:.1f}% "
        f"mean_dis={res.mean_distance * 1000:.1f}mm "
        f"lost={res.lost_detections}/{res.num_objects} "
        f"({res.num_frames} frames)")
    return res, mat_dir


def toolbox_report(args, test_ds, sym_list, res, mat_dir, log):
    """The offline toolbox step: re-evaluate the exported .mat poses
    against ground truth (replace_ycb_toolbox equivalent) and write the
    table + curves."""
    from plr2_tpu.eval.report import (accuracy_table, distances_from_mat_dir,
                                      format_accuracy_table,
                                      plot_accuracy_curves,
                                      save_distance_report)

    per_obj = distances_from_mat_dir(mat_dir, test_ds.frames,
                                     dict(test_ds.models), sym_list=sym_list)
    # offline re-eval scores only exported (detected) poses; the live
    # result additionally counts lost detections as inf
    diam = {oid: test_ds.diameters[oid - 1] for oid in test_ds.models}
    rows = accuracy_table(per_obj, diameters=diam)
    log(format_accuracy_table(rows))
    report_json = os.path.join(args.outf, "distance_report.json")
    save_distance_report(report_json, res.per_object_distances,
                         meta={"diameters": diam,
                               "lost_detections": res.lost_detections,
                               "auc": res.auc, "under_2cm": res.under_2cm})
    curves = os.path.join(args.outf, "accuracy_curves.png")
    try:
        plot_accuracy_curves(per_obj, curves)
        log(f"curves written to {curves}")
    except Exception as e:  # matplotlib backend issues must not kill the run
        log(f"curve plot skipped: {e!r}")
    log(f"distance report written to {report_json}")
    return rows


def main(argv=None):
    args = parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    def log(msg):
        print(msg, flush=True)

    t0 = time.time()
    models, train_ds, val_ds, test_ds, sym_list = build_datasets(args)
    log(f"library: {args.objects} objects (sym 0-based {sym_list}); "
        f"{len(train_ds)} train / {len(val_ds)} val / {len(test_ds)} test "
        f"samples over {args.train_frames}/{len(val_ds.frames)}/"
        f"{args.test_frames} frames ({time.time() - t0:.0f}s)")

    t1 = time.time()
    trainer, state, best = train_posenet(args, train_ds, val_ds, sym_list,
                                         log)
    t_train = time.time() - t1
    log(f"posenet+refiner training: {t_train:.0f}s "
        f"(epoch {state.epoch}, best={state.best_test:.5f}, "
        f"decay={state.decay_started} refine={state.refine_started})")

    t2 = time.time()
    seg, seg_st, seg_acc = train_segnet(args, train_ds, test_ds, log)
    t_seg = time.time() - t2

    t3 = time.time()
    res, mat_dir = eval_full_pipeline(args, trainer.pipe, best.variables,
                                      test_ds, sym_list, seg, seg_st, log)
    t_eval = time.time() - t3
    toolbox_report(args, test_ds, sym_list, res, mat_dir, log)

    summary = {
        "auc": round(res.auc, 2),
        "under_2cm_pct": round(res.under_2cm * 100, 1),
        "mean_distance_mm": round(res.mean_distance * 1000, 2),
        "lost_detections": res.lost_detections,
        "num_objects_scored": res.num_objects,
        "segnet_pixel_acc": round(seg_acc, 4),
        "refine_started": bool(state.refine_started),
        "decay_started": bool(state.decay_started),
        "epochs": state.epoch,
        "wall_s": {"total": round(time.time() - t0, 1),
                   "train": round(t_train, 1), "segnet": round(t_seg, 1),
                   "eval": round(t_eval, 1)},
    }
    with open(os.path.join(args.outf, "journey_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    log("JOURNEY " + json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
