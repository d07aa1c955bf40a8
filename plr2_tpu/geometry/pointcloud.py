"""Point-cloud geometry: depth backprojection, pose application/composition.

Replaces the per-sample NumPy preprocessing in the reference datasets
(upstream datasets/{ycb,linemod}/dataset.py __getitem__, SURVEY.md section
3.4) with fused, jit-able jnp ops, and the eval drivers' pose-composition
arithmetic (tools/eval_ycb.py refine loop) with `compose_pose`.

Convention: poses are (q, t) with q a wxyz quaternion and t a 3-vector;
point clouds are row-vector arrays (..., N, 3); applying a pose is
`points @ R(q) ... ` per the reference's row-vector convention documented in
geometry/quaternion.py — i.e. world points = model_points @ R^T_std + t
which the reference writes as np.dot(model_points, target_r.T) + target_t.
Here we store R as the (3,3) standard matrix and apply `p @ R.T + t`
(identical arithmetic to the reference's dataset-side np.dot(p, R.T)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from plr2_tpu.geometry.quaternion import quat_to_matrix_df, quat_multiply

# Every matmul here touches METRIC coordinates: TPU f32 matmuls default to
# bf16 operands, which rounds point coordinates by ~2^-9 relative — fatal
# for distances measured against mm-scale thresholds (CLAUDE.md precision
# rule). All pose applications therefore run at HIGHEST; the contractions
# are K=3 and padding-bound on the MXU either way.
_HI = jax.lax.Precision.HIGHEST


def backproject_depth(
    depth: jnp.ndarray,
    ymap: jnp.ndarray,
    xmap: jnp.ndarray,
    cam_cx: jnp.ndarray,
    cam_cy: jnp.ndarray,
    cam_fx: jnp.ndarray,
    cam_fy: jnp.ndarray,
    cam_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Pinhole backprojection, identical arithmetic to the reference datasets:

        z = depth / cam_scale
        x = (xmap - cx) * z / fx        # xmap = column index (u)
        y = (ymap - cy) * z / fy        # ymap = row index (v)

    depth/ymap/xmap are flat (N,) arrays of selected pixels ("choose" gather
    happens before this). Returns (N, 3) cloud [x, y, z].
    """
    z = depth / cam_scale
    x = (xmap - cam_cx) * z / cam_fx
    y = (ymap - cam_cy) * z / cam_fy
    return jnp.stack([x, y, z], axis=-1)


def transform_points(points: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply pose: (..., N, 3) @ (..., 3, 3)^T + (..., 3) -> world points.

    Matches np.dot(points, R.T) + t from the reference datasets.
    """
    return jnp.matmul(points, jnp.swapaxes(r, -1, -2),
                      precision=_HI) + t[..., None, :]


def apply_pose_quat(points: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply pose given a normalized wxyz quaternion."""
    return transform_points(points, quat_to_matrix_df(q), t)


def compose_pose(
    q_outer: jnp.ndarray,
    t_outer: jnp.ndarray,
    q_inner: jnp.ndarray,
    t_inner: jnp.ndarray,
):
    """Compose two poses: result applies inner first, then outer.

    R = R_outer @ R_inner; t = R_outer @ t_inner + t_outer.
    This is the eval drivers' `my_mat = np.dot(my_mat, mat2)` chaining
    (tools/eval_ycb.py refine loop) expressed on (q, t) pairs.
    """
    q = quat_multiply(q_outer, q_inner)
    r_outer = quat_to_matrix_df(q_outer)
    t = jnp.squeeze(jnp.matmul(r_outer, t_inner[..., :, None],
                               precision=_HI), -1) + t_outer
    return q, t


def recenter_points(points: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Express `points` in the frame of pose (q, t): (p - t) @ R(q).

    This is the reference loss's new_points computation
    (lib/loss.py: bmm(points - T, ori_base) with ori_base = R contiguous),
    feeding the refiner with the cloud re-centred by the current estimate.
    """
    r = quat_to_matrix_df(q)
    return jnp.matmul(points - t[..., None, :], r, precision=_HI)
