"""Typed configuration for the plr2_tpu pipeline.

Replaces the reference's argparse-flag soup (tools/train.py in the upstream
DenseFusion layout; SURVEY.md section 5.6) with frozen dataclasses. The
hyperparameters below ARE the behavior contract of the reference curriculum:
  num_points 500 (LineMOD) / 1000 (YCB), w=0.015, lr=1e-4,
  decay x0.3 when best test dis < 0.016, refine switch at dis < 0.013,
  iteration=2, noise_trans=0.03, batch_size=8 (accumulated), nepoch=500.

The five presets match /root/repo/BASELINE.json:6-12.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Dataset geometry & sampling contract (SURVEY.md section 2 #8/#9)."""

    name: str = "linemod"  # "linemod" | "ycb"
    root: str = ""
    num_points: int = 500  # sampled cloud points per object
    num_objects: int = 13
    num_mesh_points: int = 500  # model points used by the ADD loss
    # refine-stage mesh resolution (upstream num_pt_mesh_large: YCB scores
    # the joint stage against 2600 model points; LineMOD keeps 500)
    num_mesh_points_large: int = 500
    # symmetric object indices (LineMOD: eggbox=7, glue=8 in the 13-class
    # list; YCB: 12, 15, 18, 19, 20 — see _YCB_SYM below)
    sym_list: Tuple[int, ...] = (7, 8)
    add_noise: bool = True
    noise_trans: float = 0.03
    # fixed crop size for the TPU path; reference uses variable border_list
    # windows — we bucket crops to (crop_size, crop_size) (see data/bbox.py)
    crop_size: int = 160
    img_height: int = 480
    img_width: int = 640


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PoseNet/PoseRefineNet dimensions (upstream lib/network.py layout)."""

    num_points: int = 500
    num_objects: int = 13
    emb_dim: int = 32  # PSPNet per-pixel color embedding channels
    # NOTE: the former loss-side `use_pallas` knob was collapsed in round
    # 3 — the ADD-S chamfer always takes the chunked XLA path, which
    # re-measured faster than the Pallas kernels at EVERY target size
    # after the round-2 XLA rewrites (ops/knn.py docstring has the
    # numbers; pallas_knn.py keeps the kernels as the escape hatch).
    # Model-side Pallas (fused pose-head MLP + fused PSP upsample
    # kernels). Off by default: measured END-TO-END on v5e (batch 64,
    # bf16) the plain-XLA pipeline is faster (2154 f/s) than with the
    # head kernel (2034) or heads+upsample kernels (1956) — XLA's fused
    # bf16 matmul/conv schedules win; see docs/PERF_NOTES.md.
    use_pallas_model: bool = False
    # Phase-decomposed PSP upsample stages (ops/phase_upconv.py): exact
    # rewrite of upsample2x+conv3x3 as one low-res conv with 4 phase
    # kernels — no 2x-map HBM round-trips, full MXU tiles for the
    # 64-channel stages. Default ON: measured faster for inference
    # (+6% e2e at batch 128) AND training (114.6 vs 119.4 ms stage-1
    # step), and f32-bit-identical on the held-out eval
    # (tools/eval_precision_modes.py).
    phase_upsample: bool = True
    dtype: str = "float32"  # compute dtype for the CNN trunk ("bfloat16" ok)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Curriculum schedule (upstream tools/train.py semantics)."""

    batch_size: int = 8  # gradient-accumulation count in the reference
    lr: float = 1e-4
    lr_rate: float = 0.3  # lr decay factor
    w: float = 0.015  # confidence regularization weight
    w_rate: float = 0.3  # w decay factor
    decay_margin: float = 0.016  # best test dis below this -> decay lr & w
    refine_margin: float = 0.013  # best test dis below this -> train refiner
    refine_iterations: int = 2  # on-device refine steps during joint stage
    nepoch: int = 500
    repeat_epoch: int = 1
    seed: int = 0
    # host data-plane worker threads (the reference's DataLoader
    # --workers): 0 = inline device preprocessing; >0 = threaded C++
    # data plane (decode + mask->bbox->choose->backproject off the main
    # thread) with augmentation applied on device after upload
    workers: int = 0
    checkpoint_dir: str = "trained_models"
    log_dir: str = "experiments/logs"
    resume_posenet: str = ""
    resume_refinenet: str = ""
    start_epoch: int = 1
    # Fuse each gradient-accumulation window into ONE on-device program
    # (train/fused_accum.py): per-sample grads summed, batch-1 BN updated
    # sequentially, one optimizer step — the reference per-sample loop's
    # semantics at batched dispatch cost. Ignored in --batched mode
    # (BatchTrainer is the deliberate mean-grad/batch-BN deviation).
    fused_accum: bool = False
    # Batched-mode mixed-batch ADD-S compaction (losses/add_loss.py
    # max_sym_slots): >0 = chamfer at most this many symmetric samples
    # per batch through static compaction slots (exact; falls back to the
    # full path when a batch has more), -1 = auto-size from the dataset's
    # symmetric-object fraction, 0 = off. Default auto: measured 66.6 vs
    # 125.0 ms/step (1.9x) on a 4-sym/32 YCB-shape stage-1 batch (v5e).
    sym_slots: int = -1
    # Run the per-epoch test loop batched (one eval_dis dispatch per
    # batch_size samples on a shared snapped canvas, cycle-padded tail)
    # instead of one dispatch per sample. BatchTrainer always does this;
    # the flag opts the per-sample Trainer / FusedTrainer test loops in —
    # on the relay-latency TPU path the per-sample test loop otherwise
    # dominates epoch wall-time. Spatial contract: crops share the
    # snapped canvas (the batched modes' documented deviation).
    batched_test: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # inference-time refinement iterations (BASELINE config 4 => 2, config 5 => 4)
    eval_refine_iterations: int = 2
    # data-parallel batch sharding axis size hint (1 = single chip)
    data_parallel: int = 1
    # tensor-parallel `model` mesh axis size (1 = off). With N > 1 the
    # batched trainer lays devices out as a (data_parallel, N) 2-D mesh
    # and shards the fusion-trunk/head matmul ladders Megatron-style
    # (parallel/tensor_parallel.py). Requires the default XLA head path
    # (incompatible with use_pallas_model).
    model_parallel: int = 1


# YCB-Video symmetric objects (upstream datasets/ycb/dataset.py):
# 024_bowl, 036_wood_block, 051_large_clamp, 052_extra_large_clamp, 061_foam_brick
_YCB_SYM = (12, 15, 18, 19, 20)

_LINEMOD = DatasetConfig(
    name="linemod", num_points=500, num_objects=13, num_mesh_points=500,
    sym_list=(7, 8), crop_size=160,
)
_YCB = DatasetConfig(
    name="ycb", num_points=1000, num_objects=21, num_mesh_points=500,
    num_mesh_points_large=2600, sym_list=_YCB_SYM, crop_size=160,
)


def _preset_1() -> PipelineConfig:
    """LineMOD 'ape': PoseNet forward, batch 1, 500 points, CPU smoke."""
    return PipelineConfig(
        dataset=_LINEMOD,
        model=ModelConfig(num_points=500, num_objects=13),
        train=TrainConfig(batch_size=1),
        eval_refine_iterations=0,
    )


def _preset_2() -> PipelineConfig:
    """LineMOD 13-object PoseNet training with ADD loss (ADD-S for sym)."""
    return PipelineConfig(
        dataset=_LINEMOD,
        model=ModelConfig(num_points=500, num_objects=13),
        train=TrainConfig(),
    )


def _preset_3() -> PipelineConfig:
    """YCB 21-object PoseNet training, 1000 points, confidence-weighted loss."""
    return PipelineConfig(
        dataset=_YCB,
        model=ModelConfig(num_points=1000, num_objects=21),
        train=TrainConfig(),
    )


def _preset_4() -> PipelineConfig:
    """YCB PoseNet + PoseRefineNet 2-iter refinement (joint fine-tune)."""
    return PipelineConfig(
        dataset=_YCB,
        model=ModelConfig(num_points=1000, num_objects=21),
        train=TrainConfig(refine_iterations=2),
        eval_refine_iterations=2,
    )


def _preset_5() -> PipelineConfig:
    """Full pipeline: seg-mask crop + DenseFusion + 4-iter refine, batched."""
    return PipelineConfig(
        dataset=_YCB,
        model=ModelConfig(num_points=1000, num_objects=21),
        train=TrainConfig(refine_iterations=2),
        eval_refine_iterations=4,
        data_parallel=1,
    )


PRESETS = {
    "linemod_smoke": _preset_1,
    "linemod_train": _preset_2,
    "ycb_train": _preset_3,
    "ycb_refine": _preset_4,
    "full_pipeline": _preset_5,
}


def get_preset(name: str) -> PipelineConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]()
