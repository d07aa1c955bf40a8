#!/usr/bin/env python
"""Render segnet_results/ predicted masks for LineMOD evaluation.

The reference evaluates LineMOD with SegNet masks it ships pre-rendered
under Linemod_preprocessed/segnet_results/ [upstream tools/eval_linemod.py,
mount empty]. This tool produces that layout from the in-repo SegNet:

  python tools/segment_linemod.py --dataset_root <Linemod_preprocessed> \
      --model experiments/trained_models/seg/best.msgpack \
      --out <Linemod_preprocessed>/segnet_results

then evaluate with `tools/eval_linemod.py --segnet_results <out>`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", type=str, required=True)
    p.add_argument("--model", type=str, required=True,
                   help="SegNet variables (save_variables msgpack)")
    p.add_argument("--out", type=str, required=True,
                   help="output segnet_results directory")
    p.add_argument("--num_classes", type=int, default=14,
                   help="background + objlist classes")
    p.add_argument("--arch", type=str, default="segnet",
                   choices=("segnet", "pspnet"))
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()
    import jax.numpy as jnp

    from plr2_tpu.eval.segment import segnet_predictor, write_segnet_results
    from plr2_tpu.train.checkpoint import load_variables
    from plr2_tpu.train.seg_trainer import SegTrainer

    trainer = SegTrainer(num_classes=args.num_classes, arch=args.arch)
    template = trainer.init_state(jax.random.key(0))["variables"]
    variables = load_variables(args.model, template)
    n = write_segnet_results(args.dataset_root, args.out,
                             segnet_predictor(variables, args.num_classes,
                                              arch=args.arch),
                             split=args.split)
    print(f"wrote {n} predicted masks under {args.out}")


if __name__ == "__main__":
    main()
