"""On-device iterative pose refinement.

The reference runs the 2-4 PoseRefineNet iterations in host Python
(tools/eval_ycb.py / tools/train.py loops — SURVEY.md section 3.5),
re-centring the cloud, calling the refiner, and composing homogeneous
matrices with NumPy each step. Here the whole loop is a `jax.lax.scan`
inside one jit: state is the (q, t) pose, the cloud/embedding stay on
device, and pose composition is quaternion arithmetic — zero host
round-trips per frame.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from plr2_tpu.geometry.quaternion import normalize_quaternion
from plr2_tpu.geometry.pointcloud import compose_pose, recenter_points


def initial_pose(
    pred_r: jnp.ndarray,  # (B, N, 4)
    pred_t: jnp.ndarray,  # (B, N, 3)
    pred_c: jnp.ndarray,  # (B, N, 1)
    points: jnp.ndarray,  # (B, N, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-confidence hypothesis -> (q (B,4), t (B,3)).

    Mirrors the eval drivers: which_max = argmax(pred_c);
    t = points[which_max] + pred_t[which_max]; q = normalized pred_r row.
    """
    which = jnp.argmax(pred_c[..., 0], axis=-1)  # (B,)
    take = lambda arr: jnp.take_along_axis(  # noqa: E731
        arr, which[:, None, None], axis=1
    )[:, 0]
    q = normalize_quaternion(take(pred_r))
    t = take(points) + take(pred_t)
    return q, t


def iterative_refine(
    refiner_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                         Tuple[jnp.ndarray, jnp.ndarray]],
    cloud: jnp.ndarray,  # (B, N, 3)
    emb: jnp.ndarray,    # (B, N, 32)
    obj: jnp.ndarray,    # (B,)
    q0: jnp.ndarray,     # (B, 4)
    t0: jnp.ndarray,     # (B, 3)
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan `num_iterations` refinement steps; returns the final (q, t).

    Each step (identical arithmetic to the reference eval loop):
      new_cloud = (cloud - t) @ R(q)
      dq, dt    = refiner(new_cloud, emb, obj)
      (q, t)   <- (q, t) composed-with (dq, dt)   # R@dR, R@dt + t
    """
    if num_iterations == 0:
        return q0, t0

    def step(carry, _):
        q, t = carry
        new_cloud = recenter_points(cloud, q, t)
        dq, dt = refiner_fn(new_cloud, emb, obj)
        dq = normalize_quaternion(dq[:, 0, :])
        dt = dt[:, 0, :]
        q2, t2 = compose_pose(q, t, dq, dt)
        return (q2, t2), None

    (q, t), _ = jax.lax.scan(step, (q0, t0), None, length=num_iterations)
    return q, t
