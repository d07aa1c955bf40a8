#!/usr/bin/env python
"""Export a plr2_tpu training checkpoint as reference-layout torch .pth
files, so weights trained here can be loaded by the reference's PyTorch
stack (upstream lib/network.py state_dict naming) — the inverse of
`--resume_posenet`-style .pth import (models/torch_import.py).

  python tools/export_torch.py --checkpoint trained_models/linemod \
      --out_dir exported/            # writes pose_model.pth + pose_refine_model.pth
  python tools/export_torch.py --checkpoint trained_models/ycb --tag best \
      --reference_names              # pose_model_<epoch>_<dis>.pth naming
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint dir (CheckpointManager root) or the "
                        "path of one saved tag (e.g. .../linemod/best)")
    p.add_argument("--tag", type=str, default="best")
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--reference_names", action="store_true",
                   help="name files pose_model_<epoch>_<dis>.pth like the "
                        "reference's epoch-best saves")
    p.add_argument("--no_refiner", action="store_true",
                   help="export only the PoseNet .pth")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from plr2_tpu.models.torch_export import save_reference_checkpoint
    from plr2_tpu.train import CheckpointManager

    ckpt_dir, tag = args.checkpoint, args.tag
    if os.path.exists(os.path.join(ckpt_dir, "_CHECKPOINT_METADATA")):
        # --checkpoint points at one saved tag, not the manager root
        ckpt_dir, tag = (os.path.dirname(os.path.abspath(ckpt_dir)),
                         os.path.abspath(ckpt_dir))
    payload = CheckpointManager(ckpt_dir).restore(tag)
    if payload is None:
        raise SystemExit(f"no checkpoint {tag!r} under {ckpt_dir!r}")
    meta = payload["meta"]

    if args.reference_names:
        stem = f"_{int(meta['epoch'])}_{float(meta['best_test']):.6f}.pth"
        pose_name, refine_name = "pose_model" + stem, "pose_refine_model" + stem
    else:
        pose_name, refine_name = "pose_model.pth", "pose_refine_model.pth"

    os.makedirs(args.out_dir, exist_ok=True)
    pose_path = os.path.join(args.out_dir, pose_name)
    refine_path = "" if args.no_refiner else os.path.join(args.out_dir,
                                                          refine_name)
    save_reference_checkpoint(payload["variables"], pose_path, refine_path)
    print(f"wrote {pose_path}")
    if refine_path:
        print(f"wrote {refine_path}")
    print(f"(epoch {int(meta['epoch'])}, best test dis "
          f"{float(meta['best_test']):.6f})")


if __name__ == "__main__":
    main()
