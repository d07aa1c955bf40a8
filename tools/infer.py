#!/usr/bin/env python
"""Single-frame pose inference CLI.

  python tools/infer.py --synthetic                       # demo frame
  python tools/infer.py --color f-color.png --depth f-depth.png \
      --label f-label.png --obj 3 --model trained_models/ycb \
      --points models/obj.xyz --cam 312.99,241.31,1066.78,1067.49,10000

Prints the estimated pose (wxyz quaternion + translation) and, when ground
truth is available (synthetic mode), the ADD error.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--color", type=str, default="")
    p.add_argument("--depth", type=str, default="")
    p.add_argument("--label", type=str, default="")
    p.add_argument("--obj", type=int, default=1, help="object id in the label map")
    p.add_argument("--points", type=str, default="", help="model .xyz/.ply file")
    p.add_argument("--cam", type=str, default="312.9869,241.3109,1066.778,1067.487,10000",
                   help="cx,cy,fx,fy,cam_scale")
    p.add_argument("--model", type=str, default="", help="checkpoint dir")
    p.add_argument("--num_points", type=int, default=1000)
    p.add_argument("--num_objects", type=int, default=21)
    p.add_argument("--refine_iterations", type=int, default=2)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from plr2_tpu.utils.cache import (enable_compilation_cache,
                                      enable_cpu_compilation_cache)
    enable_cpu_compilation_cache() if args.cpu else enable_compilation_cache()
    import numpy as np

    from plr2_tpu.data.loader import SyntheticPoseDataset, raw_to_sample
    from plr2_tpu.eval.metrics import add_distance
    from plr2_tpu.pipeline import DenseFusionPipeline
    from plr2_tpu.train import CheckpointManager, Trainer
    from plr2_tpu.config import get_preset

    if args.synthetic:
        ds = SyntheticPoseDataset(num_frames=1, num_objects=1,
                                  model_points=500,
                                  num_points=args.num_points, seed=0)
        raw = ds.get_raw(0)
    else:
        from PIL import Image
        cx, cy, fx, fy, cam_scale = (float(x) for x in args.cam.split(","))
        color = np.asarray(Image.open(args.color).convert("RGB"))
        depth = np.asarray(Image.open(args.depth), dtype=np.float32)
        label = np.asarray(Image.open(args.label), dtype=np.int32)
        if args.points.endswith(".ply"):
            from plr2_tpu.data.linemod import parse_ply_vertices
            mp = parse_ply_vertices(args.points) / 1000.0
        else:
            mp = np.loadtxt(args.points, dtype=np.float32)
        if len(mp) > 500:
            mp = mp[np.sort(np.random.default_rng(0).choice(len(mp), 500,
                                                            replace=False))]
        raw = dict(color=color, depth=depth,
                   mask=(label == args.obj) & (depth > 0),
                   target_r=np.eye(3, dtype=np.float32),
                   target_t=np.zeros(3, np.float32),
                   model_points=mp.astype(np.float32),
                   obj_idx=args.obj - 1,
                   intrinsics=dict(cx=cx, cy=cy, fx=fx, fy=fy,
                                   cam_scale=cam_scale))

    import dataclasses
    from plr2_tpu.config import DatasetConfig, ModelConfig

    pipe = DenseFusionPipeline(num_points=args.num_points,
                               num_objects=args.num_objects)
    cfg = dataclasses.replace(
        get_preset("ycb_refine"),
        dataset=DatasetConfig(num_points=args.num_points,
                              num_objects=args.num_objects),
        model=ModelConfig(num_points=args.num_points,
                          num_objects=args.num_objects))
    trainer = Trainer(cfg, pipe)
    variables = pipe.init(jax.random.key(0), crop_hw=160, batch=1)
    if args.model:
        state_holder = trainer.init_state(jax.random.key(0))
        state_holder.variables = variables
        before = state_holder.epoch
        state_holder = CheckpointManager(args.model).restore_into(state_holder)
        if state_holder.epoch == before:
            raise SystemExit(f"no checkpoint found under {args.model!r}")
        variables = state_holder.variables
        print(f"loaded checkpoint (epoch {state_holder.epoch})")

    s = raw_to_sample(raw, jax.random.key(0), args.num_points, add_noise=False)
    est = pipe.estimate(variables, s.img[None], s.points[None], s.choose[None],
                        s.idx[None], refine_iterations=args.refine_iterations)
    q = np.asarray(est.quat[0])
    t = np.asarray(est.trans[0])
    print(f"pose quaternion (wxyz): {np.round(q, 5).tolist()}")
    print(f"translation (m):        {np.round(t, 5).tolist()}")
    print(f"confidence:             {float(est.confidence[0]):.4f}")
    if args.synthetic:
        err = float(add_distance(s.model_points, est.quat[0], est.trans[0],
                                 s.target))
        print(f"ADD error vs ground truth: {err:.4f} m "
              "(untrained weights unless --model given)")


if __name__ == "__main__":
    main()
