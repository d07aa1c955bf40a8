#!/bin/bash
# YCB-Video evaluation: ADD-S AUC + <2cm, 2-iter refinement (BASELINE config 4).
set -e
cd "$(dirname "$0")/../.."
python tools/eval_ycb.py \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" \
  --model "trained_models/ycb" --refine_iterations 2 "$@"
