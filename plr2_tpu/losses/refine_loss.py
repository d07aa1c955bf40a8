"""Refiner ADD(-S) loss — reference lib/loss_refiner.py semantics
(SURVEY.md section 2 #7), vectorized over the batch.

The refiner predicts ONE pose delta per sample in the re-centred frame:
  pred = model_points @ R_delta^T + t_delta
  dis  = mean_j ||pred_j - target_j||          (ADD)
       = mean_j min_k ||pred_j - target_k||    (ADD-S for symmetric objects —
                                               always applied here, no
                                               refine guard)
and emits (new_points, new_target) re-centred by the delta for the next
refinement iteration. No confidence term.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from plr2_tpu.geometry.quaternion import normalize_quaternion, quat_to_matrix_df
from plr2_tpu.ops.knn import chamfer_min_distance, safe_norm


class RefineLossOut(NamedTuple):
    dis: jnp.ndarray         # (B,) mean distance (this IS the refiner loss)
    new_points: jnp.ndarray  # (B, N, 3)
    new_target: jnp.ndarray  # (B, M, 3)


@functools.partial(jax.jit, static_argnames=("sym_list",))
def refine_loss(
    pred_r: jnp.ndarray,        # (B, 1, 4)
    pred_t: jnp.ndarray,        # (B, 1, 3)
    target: jnp.ndarray,        # (B, M, 3)
    model_points: jnp.ndarray,  # (B, M, 3)
    idx: jnp.ndarray,           # (B,)
    points: jnp.ndarray,        # (B, N, 3)
    sym_list: Tuple[int, ...],
) -> RefineLossOut:
    # metric math is ALWAYS f32 (see add_loss.py) — no-op for f32 callers
    pred_r, pred_t, target, model_points, points = (
        x.astype(jnp.float32)
        for x in (pred_r, pred_t, target, model_points, points))
    q = normalize_quaternion(pred_r[:, 0, :])  # (B, 4)
    rot = quat_to_matrix_df(q)  # (B, 3, 3)
    t = pred_t[:, 0, :]  # (B, 3)

    # HIGHEST: metric coordinates (see add_loss.py / CLAUDE.md precision rule)
    pred = jnp.matmul(model_points, jnp.swapaxes(rot, -1, -2),
                      precision=jax.lax.Precision.HIGHEST) + t[:, None, :]

    dis_add = jnp.mean(safe_norm(pred - target), axis=-1)  # (B,)
    if len(sym_list) > 0:
        sym_arr = jnp.asarray(sym_list, dtype=idx.dtype)
        is_sym = jnp.any(idx[:, None] == sym_arr[None, :], axis=-1)
        dis_adds = jax.vmap(
            lambda p, tg: jnp.mean(
                chamfer_min_distance(p[None], tg)[0]
            )
        )(pred, target)
        dis = jnp.where(is_sym, dis_adds, dis_add)
    else:
        dis = dis_add

    new_points = jnp.matmul(points - t[:, None, :], rot,
                            precision=jax.lax.Precision.HIGHEST)
    new_target = jnp.matmul(target - t[:, None, :], rot,
                            precision=jax.lax.Precision.HIGHEST)
    return RefineLossOut(
        dis=dis,
        new_points=jax.lax.stop_gradient(new_points),
        new_target=jax.lax.stop_gradient(new_target),
    )
