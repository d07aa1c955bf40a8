#!/bin/bash
# LineMOD evaluation: per-object ADD(-S) < 0.1*diameter success.
set -e
cd "$(dirname "$0")/../.."
python tools/eval_linemod.py \
  --dataset_root "${LINEMOD_ROOT:-datasets/linemod/Linemod_preprocessed}" \
  --model "trained_models/linemod" --refine_iterations 4 "$@"
