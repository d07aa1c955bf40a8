#!/bin/bash
# Canonical LineMOD training flags (BASELINE config 2).
set -e
cd "$(dirname "$0")/../.."
python tools/train.py --dataset linemod \
  --dataset_root "${LINEMOD_ROOT:-datasets/linemod/Linemod_preprocessed}" \
  --batch_size 8 --lr 1e-4 --w 0.015 \
  --decay_margin 0.016 --refine_margin 0.013 --iteration 2 --nepoch 500 "$@"
