#!/bin/bash
# Canonical YCB-Video training flags (BASELINE configs 3/4).
set -e
cd "$(dirname "$0")/../.."
python tools/train.py --dataset ycb \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" \
  --batch_size 8 --lr 1e-4 --w 0.015 \
  --decay_margin 0.016 --refine_margin 0.013 --iteration 2 --nepoch 500 "$@"
