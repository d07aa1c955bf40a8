"""Quaternion utilities (pure jnp, wxyz convention).

`quat_to_matrix_df` reproduces the exact element layout the reference's loss
builds inline (upstream lib/loss.py `loss_calculation`, see SURVEY.md
section 2 #6): a matrix `base` such that transformed points are computed as
`points @ base` on ROW-VECTOR point clouds. With q = (w, x, y, z):

    base = | 1-2(y²+z²)   2(xy-wz)    2(xz+wy) |
           | 2(xy+wz)    1-2(x²+z²)   2(yz-wx) |
           | 2(xz-wy)     2(yz+wx)   1-2(x²+y²)|

i.e. `base` is the standard rotation matrix R(q); `points @ R(q)` applies
R(q)^T to column vectors. Bit-fidelity with the reference requires keeping
this row-vector application convention throughout the loss and refiner.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quaternion(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions along the last axis (reference: torch.norm div)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_to_matrix_df(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Exact formula of the reference's loss_calculation `base` tensor;
    input is assumed already normalized (the loss normalizes first).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Normalizing wrapper: arbitrary-norm wxyz quaternion -> R(q)."""
    return quat_to_matrix_df(normalize_quaternion(q))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd-style extraction (jit/vmap safe): computes all four
    candidate solutions and selects by the largest pivot.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each scaled by its pivot 4*q_i^2 = 1 + ...
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    def _safe(x):
        return jnp.maximum(jnp.sqrt(jnp.maximum(x, 0.0)), 1e-12)

    sw, sx, sy, sz = _safe(qw2), _safe(qx2), _safe(qy2), _safe(qz2)
    cand_w = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    cand_x = jnp.stack([(m21 - m12) / sx, sx, (m10 + m01) / sx, (m02 + m20) / sx], -1)
    cand_y = jnp.stack([(m02 - m20) / sy, (m10 + m01) / sy, sy, (m21 + m12) / sy], -1)
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m21 + m12) / sz, sz], -1)

    pivots = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], -2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :] * 0.5
    return normalize_quaternion(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, wxyz, broadcasting over leading dims."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
