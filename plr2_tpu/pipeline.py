"""End-to-end inference pipeline: PoseNet -> best hypothesis -> on-device
iterative refinement, all inside a single jit.

This is the flagship compute path benchmarked against the reference's
tools/eval_* drivers (which cross the host/device boundary every refinement
iteration — SURVEY.md section 3.2). Here one XLA program takes the
preprocessed crop/cloud and returns the final (q, t) pose.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.refine.iterative import initial_pose, iterative_refine


class PoseEstimate(NamedTuple):
    quat: jnp.ndarray  # (B, 4) wxyz, normalized
    trans: jnp.ndarray  # (B, 3)
    confidence: jnp.ndarray  # (B,) max per-point confidence


class DenseFusionPipeline:
    """Bundles PoseNet + PoseRefineNet apply functions into jitted steps."""

    def __init__(self, num_points: int, num_objects: int, emb_dim: int = 32,
                 dtype: Any = jnp.float32, use_pallas: bool = False,
                 phase_upsample: bool = False,
                 scan_safe_phase_vjp: bool = False):
        self.num_points = num_points
        self.num_objects = num_objects
        self.posenet = PoseNet(num_points=num_points, num_objects=num_objects,
                               emb_dim=emb_dim, dtype=dtype,
                               use_pallas=use_pallas,
                               phase_upsample=phase_upsample,
                               scan_safe_phase_vjp=scan_safe_phase_vjp)
        self.refiner = PoseRefineNet(num_points=num_points,
                                     num_objects=num_objects, dtype=dtype)

    def init(self, key, crop_hw: int = 160, batch: int = 1):
        """Initialize both parameter trees with dummy shapes."""
        k1, k2 = jax.random.split(key)
        img = jnp.zeros((batch, crop_hw, crop_hw, 3))
        cloud = jnp.zeros((batch, self.num_points, 3))
        choose = jnp.zeros((batch, self.num_points), dtype=jnp.int32)
        obj = jnp.zeros((batch,), dtype=jnp.int32)
        pose_vars = self.posenet.init(k1, img, cloud, choose, obj)
        emb = jnp.zeros((batch, self.num_points, self.posenet.emb_dim))
        refine_vars = self.refiner.init(k2, cloud, emb, obj)
        return {"posenet": pose_vars, "refiner": refine_vars}

    @staticmethod
    def cast_variables(variables, dtype=jnp.bfloat16):
        """Cast float params/stats for the fast inference mode (together
        with constructing the pipeline with dtype=jnp.bfloat16: measured
        3,731 frames/s bf16+phase vs 3,145 f32 on v5e at batch 128, round
        2 — the f32 default is the reference-parity mode; accuracy deltas
        across modes are pinned in tools/eval_precision_modes.py)."""
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            variables)

    @functools.partial(jax.jit, static_argnames=("self", "refine_iterations"))
    def estimate(self, variables, img, cloud, choose, obj,
                 refine_iterations: int = 2) -> PoseEstimate:
        """Full forward: (B,H,W,3) crop + (B,N,3) cloud -> refined pose."""
        pred_r, pred_t, pred_c, emb = self.posenet.apply(
            variables["posenet"], img, cloud, choose, obj)
        q0, t0 = initial_pose(pred_r, pred_t, pred_c, cloud)

        def refiner_fn(new_cloud, emb_, obj_):
            return self.refiner.apply(variables["refiner"], new_cloud, emb_, obj_)

        q, t = iterative_refine(refiner_fn, cloud, emb, obj, q0, t0,
                                refine_iterations)
        conf = jnp.max(pred_c[..., 0], axis=-1)
        return PoseEstimate(quat=q, trans=t, confidence=conf)
