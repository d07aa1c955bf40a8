"""plr2_tpu — TPU-native DenseFusion RGB-D 6D pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the JonasFrey96/PLR2 pipeline
(DenseFusion: Wang et al., CVPR 2019). The compute path is pure JAX with
Pallas TPU kernels for the hot ops (ADD-S KNN chamfer distance, fused
1x1-conv dense-fusion stack); data preprocessing (mask/crop/sample/
backproject) runs fused on-device; the iterative pose refinement loop is an
on-device `jax.lax.scan`.

Layer map (mirrors the reference's capabilities, see SURVEY.md):
  geometry/  quaternion <-> rotation matrix, depth backprojection, transforms
  models/    PSPNet color encoder, PoseNet, PoseRefineNet, SegNet (flax.linen)
  ops/       Pallas kernels + XLA fallbacks (knn/chamfer, fused conv1d)
  losses/    confidence-weighted ADD(-S) loss, refiner loss
  refine/    on-device iterative refinement (lax.scan)
  data/      LineMOD / YCB-Video loaders, on-device preprocessing, synthetic fixtures
  train/     curriculum trainer (lr/w decay, refine switch), Orbax checkpoints
  eval/      ADD(-S) metrics, AUC (replaces the MATLAB YCB toolbox)
  parallel/  device-mesh sharding (data-parallel pjit)
  native/    C++ host-side data plane (PLY parsing, mask->choose sampling)
  serving    single-jit frame program: RGB-D frame -> per-object poses
"""

__version__ = "0.1.0"

from plr2_tpu.config import (  # noqa: F401
    DatasetConfig,
    ModelConfig,
    TrainConfig,
    PipelineConfig,
    get_preset,
    PRESETS,
)
