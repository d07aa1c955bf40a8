#!/usr/bin/env python
"""Training CLI — the reference's tools/train.py argparse surface
(SURVEY.md section 2 #11) over the plr2_tpu Trainer.

Examples:
  python tools/train.py --dataset linemod --dataset_root /data/Linemod_preprocessed
  python tools/train.py --dataset ycb --dataset_root /data/YCB_Video_Dataset
  python tools/train.py --dataset linemod --synthetic --nepoch 2   # smoke
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="",
                   help="YAML experiment config (configs/*.yml); flags below "
                        "override nothing when set — the YAML is authoritative")
    p.add_argument("--dataset", choices=["ycb", "linemod"], default="linemod")
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--workers", type=int, default=0,
                   help="host data-plane worker threads (0 = inline device "
                        "preprocessing; >0 = threaded C++ data plane)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_rate", type=float, default=0.3)
    p.add_argument("--w", type=float, default=0.015)
    p.add_argument("--w_rate", type=float, default=0.3)
    p.add_argument("--decay_margin", type=float, default=0.016)
    p.add_argument("--refine_margin", type=float, default=0.013)
    p.add_argument("--noise_trans", type=float, default=0.03)
    p.add_argument("--iteration", type=int, default=2)
    p.add_argument("--nepoch", type=int, default=500)
    p.add_argument("--repeat_epoch", type=int, default=1)
    p.add_argument("--pretrained_trunk", type=str, default="",
                   help="torchvision resnet18 .pth: partial ImageNet "
                        "pretrained load of the PSPNet trunk (the upstream "
                        "lib/extractors.py pretrained init; stem/layer1 "
                        "dims differ from torchvision and keep their init "
                        "- see models/torch_import.py)")
    p.add_argument("--resume_posenet", type=str, default="")
    p.add_argument("--resume_refinenet", type=str, default="")
    p.add_argument("--start_epoch", type=int, default=1)
    p.add_argument("--outf", type=str, default="trained_models")
    p.add_argument("--log_dir", type=str, default="experiments/logs")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated fixtures (no dataset_root needed)")
    p.add_argument("--synthetic_frames", type=int, default=4,
                   help="synthetic train-set size in frames (2 samples per "
                        "frame); the soak runs use a few hundred so an "
                        "epoch is dominated by training, not bookkeeping")
    p.add_argument("--batched", action="store_true",
                   help="batched throughput mode (one XLA program per "
                        "optimizer step) instead of the reference-faithful "
                        "per-sample accumulation")
    p.add_argument("--fused", action="store_true",
                   help="fuse each gradient-accumulation window into one "
                        "on-device program: exact per-sample semantics "
                        "(summed grads, sequential batch-1 BN) at batched "
                        "dispatch cost (train/fused_accum.py)")
    p.add_argument("--batched_test", action="store_true",
                   help="run the per-epoch test loop batched (one dispatch "
                        "per batch_size samples on a shared snapped canvas) "
                        "in the per-sample/--fused modes; --batched always "
                        "does this")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard batches over this many devices "
                        "(jax.sharding Mesh data axis; implies --batched); "
                        "0 = use the config value")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="tensor-parallel `model` mesh axis size: shard the "
                        "fusion-trunk/head matmul ladders Megatron-style "
                        "over a (data_parallel, N) 2-D mesh (implies "
                        "--batched; parallel/tensor_parallel.py); 0 = use "
                        "the config value")
    p.add_argument("--sym_slots", type=int, default=0,
                   help="batched mode: chamfer at most this many symmetric "
                        "samples per mixed batch via static compaction "
                        "slots (exact; -1 = auto-size from the dataset's "
                        "symmetric fraction, 0 = off)")
    p.add_argument("--cache_mb", type=int, default=0,
                   help="host-side decoded-frame LRU cache budget in MB "
                        "per dataset (0 = off); real-data epochs re-decode "
                        "identical PNGs every pass — see data/frame_cache.py")
    p.add_argument("--num_points", type=int, default=None,
                   help="override the preset's sampled-cloud size (same "
                        "override the eval CLIs expose; tests/small runs)")
    p.add_argument("--mesh_points", type=int, default=None,
                   help="override the preset's model-mesh point count")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    import dataclasses
    from plr2_tpu.config import get_preset, TrainConfig
    from plr2_tpu.data import LinemodDataset, YCBDataset, SyntheticPoseDataset
    from plr2_tpu.train import Trainer, CheckpointManager
    from plr2_tpu.utils.logger import setup_logger

    if args.config:
        from plr2_tpu.config_io import load_config
        cfg = load_config(args.config)
        if cfg.dataset.name in ("ycb", "linemod"):
            args.dataset = cfg.dataset.name
        if cfg.dataset.root:
            args.dataset_root = cfg.dataset.root
    else:
        preset = "linemod_train" if args.dataset == "linemod" else "ycb_train"
        cfg = get_preset(preset)
    if not args.config:
        cfg = dataclasses.replace(cfg, train=TrainConfig(
            batch_size=args.batch_size, lr=args.lr, lr_rate=args.lr_rate,
            w=args.w, w_rate=args.w_rate, decay_margin=args.decay_margin,
            refine_margin=args.refine_margin, refine_iterations=args.iteration,
            nepoch=args.nepoch, repeat_epoch=args.repeat_epoch, seed=args.seed,
            checkpoint_dir=args.outf, log_dir=args.log_dir,
            resume_posenet=args.resume_posenet,
            resume_refinenet=args.resume_refinenet,
            start_epoch=args.start_epoch, workers=args.workers,
            sym_slots=args.sym_slots, fused_accum=args.fused,
            batched_test=args.batched_test))
    else:
        args.nepoch = cfg.train.nepoch
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

    if args.synthetic:
        np_ = cfg.model.num_points
        train_ds = SyntheticPoseDataset(num_frames=args.synthetic_frames,
                                        num_objects=2,
                                        model_points=cfg.dataset.num_mesh_points,
                                        num_points=np_, seed=args.seed)
        test_ds = SyntheticPoseDataset(num_frames=max(2, args.synthetic_frames // 8),
                                       num_objects=2,
                                       model_points=cfg.dataset.num_mesh_points,
                                       num_points=np_, seed=args.seed + 1)
    elif args.dataset == "linemod":
        train_ds = LinemodDataset(args.dataset_root, "train",
                                  cfg.model.num_points,
                                  cfg.dataset.num_mesh_points,
                                  noise_trans=args.noise_trans,
                                  cache_mb=args.cache_mb)
        test_ds = LinemodDataset(args.dataset_root, "test",
                                 cfg.model.num_points,
                                 cfg.dataset.num_mesh_points, add_noise=False,
                                 cache_mb=args.cache_mb)
    else:
        train_ds = YCBDataset(args.dataset_root, "train", cfg.model.num_points,
                              cfg.dataset.num_mesh_points,
                              noise_trans=args.noise_trans,
                              num_mesh_points_large=cfg.dataset.num_mesh_points_large,
                              cache_mb=args.cache_mb)
        test_ds = YCBDataset(args.dataset_root, "test", cfg.model.num_points,
                             cfg.dataset.num_mesh_points, add_noise=False,
                             num_mesh_points_large=cfg.dataset.num_mesh_points_large,
                             cache_mb=args.cache_mb)

    if args.data_parallel:
        cfg = dataclasses.replace(cfg, data_parallel=args.data_parallel)
    if args.model_parallel:
        cfg = dataclasses.replace(cfg, model_parallel=args.model_parallel)

    logger = setup_logger(
        "train", os.path.join(args.log_dir, f"train_{args.dataset}.log"))
    batched = (args.batched or args.data_parallel or cfg.data_parallel > 1
               or cfg.model_parallel > 1)
    fused = args.fused or cfg.train.fused_accum
    if batched and fused:
        raise SystemExit("--fused is the exact-semantics mode; --batched/"
                         "--data_parallel is the mean-grad deviation — "
                         "pick one")
    if batched:
        from plr2_tpu.train import BatchTrainer
        trainer = BatchTrainer(cfg)
        logger.info(f"batched mode (data_parallel={cfg.data_parallel}, "
                    f"model_parallel={cfg.model_parallel})")
    elif fused:
        from plr2_tpu.train import FusedTrainer
        trainer = FusedTrainer(cfg)
        logger.info("fused accumulation mode (exact per-sample semantics, "
                    "one program per window)")
    else:
        trainer = Trainer(cfg)
    import jax.random
    # graceful preemption: installed BEFORE model init so a SIGTERM/SIGINT
    # landing anywhere after startup (long first compiles included) latches
    # instead of killing the process; fit stops at the next sample boundary
    # and saves 'last' (auto-resume below replays the epoch). A second
    # signal aborts immediately.
    from plr2_tpu.utils.interrupt import GracefulInterrupt
    with GracefulInterrupt() as stop:
        state = trainer.init_state(jax.random.key(args.seed))
        if args.pretrained_trunk:
            from plr2_tpu.models.torch_import import load_pretrained_trunk
            state.variables, imported, skipped = load_pretrained_trunk(
                args.pretrained_trunk, state.variables)
            logger.info(f"pretrained trunk {args.pretrained_trunk}: "
                        f"{len(imported)} tensors imported, {len(skipped)} "
                        f"without a deep-stem counterpart kept at init")
        ckpt = CheckpointManager(os.path.join(args.outf, args.dataset))
        if args.resume_posenet or args.resume_refinenet:
            state = ckpt.restore_into(state, tag=args.resume_posenet or "best")
            logger.info(f"resumed from epoch {state.epoch} "
                        f"(best_test={state.best_test:.5f})")
        elif ckpt.restore("last") is not None:
            # crash recovery: continue from the most recent epoch automatically
            state = ckpt.restore_into(state, tag="last")
            logger.info(f"auto-resumed from last checkpoint (epoch {state.epoch})")

        logger.info(f"training {args.dataset}: {len(train_ds)} train / "
                    f"{len(test_ds)} test samples")
        trainer.fit(state, train_ds, test_ds, jax.random.key(args.seed + 1),
                    epochs=args.nepoch, log_fn=logger.info,
                    checkpoint_fn=lambda s, d: ckpt.save(s, d),
                    save_last_fn=lambda s: ckpt.save(s, s.best_test,
                                                     tag="last"),
                    stop_fn=stop)


if __name__ == "__main__":
    main()
