"""Pose-accuracy metrics: ADD, ADD-S, threshold success, and ADD-S AUC.

Replaces the reference's offline MATLAB YCB_Video_toolbox evaluation
(replace_ycb_toolbox/*.m — SURVEY.md section 2 #14) with an in-repo
implementation. `compute_auc` reproduces the toolbox's VOCap-style
accuracy-vs-threshold integral (thresholds up to 0.1 m, scaled to [0,100]),
with distances above the cap counted as failures.

Distance computations run on device (jnp); aggregation is host NumPy.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from plr2_tpu.geometry.quaternion import quat_to_matrix_df
from plr2_tpu.ops.knn import pairwise_sq_dist


def add_distance(model_points: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
    """ADD: mean paired distance between predicted-pose and GT model points.

    model_points (M,3); q (4,) wxyz; t (3,); target (M,3) GT-posed points.
    """
    # HIGHEST: metric coordinates must not round through TPU's default
    # bf16 matmul operands (CLAUDE.md precision rule)
    pred = jnp.matmul(model_points, quat_to_matrix_df(q).T,
                      precision=jax.lax.Precision.HIGHEST) + t
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


def adds_distance(model_points: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray,
                  target: jnp.ndarray) -> jnp.ndarray:
    """ADD-S: mean nearest-neighbour distance (symmetric objects)."""
    pred = jnp.matmul(model_points, quat_to_matrix_df(q).T,
                      precision=jax.lax.Precision.HIGHEST) + t
    d2 = pairwise_sq_dist(pred[None], target[None])[0]
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=-1)))


def pose_distance(model_points, q, t, target, symmetric: bool) -> jnp.ndarray:
    return (adds_distance if symmetric else add_distance)(model_points, q, t, target)


def success_rate(distances: Sequence[float], threshold: float) -> float:
    """Fraction of samples with distance below `threshold` (LineMOD:
    0.1 * object diameter; YCB '<2cm': 0.02)."""
    d = np.asarray(list(distances), dtype=np.float64)
    if d.size == 0:
        return 0.0
    return float(np.mean(d < threshold))


def accuracy_threshold_curve(distances: Sequence[float],
                             max_dist: float = 0.1,
                             num_thresholds: int = 100):
    """(thresholds, accuracy) arrays — the toolbox's plot_accuracy_keyframe
    curve (accuracy(t) = fraction of samples with distance <= t)."""
    d = np.asarray(list(distances), dtype=np.float64)
    ts = np.linspace(0.0, max_dist, num_thresholds + 1)
    if d.size == 0:
        return ts, np.zeros_like(ts)
    acc = (d[None, :] <= ts[:, None]).mean(axis=1)
    return ts, acc


def compute_auc(distances: Sequence[float], max_dist: float = 0.1) -> float:
    """ADD-S AUC in [0, 100], toolbox VOCap semantics."""
    d = np.asarray(list(distances), dtype=np.float64)
    if d.size == 0:
        return 0.0
    n = d.size
    d = np.where(d > max_dist, np.inf, d)
    d = np.sort(d)
    acc = np.cumsum(np.ones(n)) / n

    finite = np.isfinite(d)
    if not finite.any():
        return 0.0
    rec = d[finite]
    prec = acc[finite]
    mrec = np.concatenate([[0.0], rec, [max_dist]])
    mpre = np.concatenate([[0.0], prec, [prec[-1]]])
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    ap = np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]) * (1.0 / max_dist)
    return float(ap * 100.0)
