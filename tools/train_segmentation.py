#!/usr/bin/env python
"""Segmentation training CLI — the reference's vanilla_segmentation/train.py.

Trains SegNet on YCB (color, label) frames or synthetic fixtures:
  python tools/train_segmentation.py --synthetic --nepoch 2
  python tools/train_segmentation.py --dataset_root /data/YCB_Video_Dataset
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, default="")
    p.add_argument("--nepoch", type=int, default=600)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_classes", type=int, default=22)
    p.add_argument("--arch", type=str, default="segnet",
                   choices=("segnet", "pspnet"),
                   help="segnet = reference-parity VGG16; pspnet = light "
                        "ResNet-18 stride-8 segmenter for serving")
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--logs_path", type=str, default="experiments/logs/seg")
    p.add_argument("--save_path", type=str,
                   default="experiments/trained_models/seg",
                   help="directory for best.msgpack/last.msgpack variables")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()

    from plr2_tpu.train.seg_trainer import SegTrainer
    from plr2_tpu.utils.logger import setup_logger

    logger = setup_logger("seg", os.path.join(args.logs_path, "train.log"))

    if args.synthetic:
        from plr2_tpu.data.synthetic import make_scene
        frames = [make_scene(num_objects=3, seed=s)[0] for s in range(6)]
    else:
        import types
        import numpy as np
        from plr2_tpu.data import YCBDataset
        ds = YCBDataset(args.dataset_root, "train")
        frames = []
        for i in range(len(ds)):
            fr = ds.get_frame(i)
            frames.append(types.SimpleNamespace(
                color=fr["color"], label=np.asarray(fr["label"], np.int32)))

    from plr2_tpu.train.checkpoint import save_variables

    trainer = SegTrainer(num_classes=args.num_classes, lr=args.lr,
                         crop=args.crop, batch=args.batch_size,
                         arch=args.arch)
    state = trainer.init_state(jax.random.key(0))
    from plr2_tpu.utils.interrupt import GracefulInterrupt
    with GracefulInterrupt() as stop:
        for epoch in range(1, args.nepoch + 1):
            # stop_fn checked at batch boundaries inside the epoch, like
            # the pose trainers — a SIGTERM mid-epoch saves 'last' within
            # one step's latency instead of waiting for the epoch end
            state = trainer.train_epoch(state, frames, seed=epoch,
                                        stop_fn=stop)
            if state.get("interrupted"):
                save_variables(os.path.join(args.save_path, "last.msgpack"),
                               state["variables"])
                logger.info(f"interrupt requested: stopped during epoch "
                            f"{epoch} at a batch boundary ('last' saved)")
                break
            logger.info(f"epoch {epoch}: loss={state['last_epoch_loss']:.5f} "
                        f"({state['seconds']:.1f}s)")
            save_variables(os.path.join(args.save_path, "last.msgpack"),
                           state["variables"])
            if state["last_epoch_loss"] < state["best_loss"]:
                state["best_loss"] = state["last_epoch_loss"]
                save_variables(os.path.join(args.save_path, "best.msgpack"),
                               state["variables"])
            if stop():
                logger.info(f"interrupt requested: stopped cleanly after "
                            f"epoch {epoch} ('last' saved)")
                break


if __name__ == "__main__":
    main()
