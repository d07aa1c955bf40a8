#!/bin/bash
# SegNet training on YCB labels (vanilla_segmentation equivalent).
set -e
cd "$(dirname "$0")/../.."
python tools/train_segmentation.py \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" \
  --batch_size 3 --lr 1e-4 --nepoch 600 "$@"
