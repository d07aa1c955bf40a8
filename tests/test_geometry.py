"""Golden-value tests for geometry vs NumPy/scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from plr2_tpu.geometry import (
    normalize_quaternion,
    quat_to_matrix_df,
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
    backproject_depth,
    transform_points,
    compose_pose,
    transformations as tfs,
)
from plr2_tpu.geometry.pointcloud import apply_pose_quat, recenter_points


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_matrix_matches_scipy(rng):
    q = _rand_quats(rng, 64)
    m = np.asarray(quat_to_matrix_df(jnp.asarray(q)))
    # scipy uses xyzw ordering
    m_ref = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=1e-6)


def test_quat_to_matrix_matches_gohlke(rng):
    q = _rand_quats(rng, 16)
    for qi in q:
        m = np.asarray(quat_to_matrix_df(jnp.asarray(qi)))
        np.testing.assert_allclose(m, tfs.quaternion_matrix(qi)[:3, :3], atol=1e-6)


def test_matrix_to_quat_roundtrip(rng):
    q = _rand_quats(rng, 128)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
    m = quat_to_matrix_df(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quat(m))
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_matrix_to_quat_edge_cases():
    # identity, and 180-degree rotations about each axis (trace = -1 paths)
    mats = [np.eye(3)]
    for axis in range(3):
        d = -np.ones(3)
        d[axis] = 1.0
        mats.append(np.diag(d))
    for m in mats:
        q = np.asarray(matrix_to_quat(jnp.asarray(m)))
        m2 = np.asarray(quat_to_matrix_df(jnp.asarray(q)))
        np.testing.assert_allclose(m2, m, atol=1e-5)


def test_quat_multiply_matches_scipy(rng):
    a, b = _rand_quats(rng, 32), _rand_quats(rng, 32)
    out = np.asarray(quat_multiply(jnp.asarray(a), jnp.asarray(b)))
    ref = (R.from_quat(a[:, [1, 2, 3, 0]]) * R.from_quat(b[:, [1, 2, 3, 0]])).as_quat()
    ref = ref[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(out * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(out, ref * sign, atol=1e-6)


def test_normalize_quaternion(rng):
    q = rng.normal(size=(8, 4)) * 10
    n = np.linalg.norm(np.asarray(normalize_quaternion(jnp.asarray(q))), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-6)


def test_backprojection_matches_numpy_reference(rng):
    """Mirror the reference dataset arithmetic exactly."""
    n = 500
    depth = rng.uniform(400, 2000, size=n).astype(np.float32)
    ymap = rng.integers(0, 480, size=n).astype(np.float32)
    xmap = rng.integers(0, 640, size=n).astype(np.float32)
    cx, cy, fx, fy, scale = 312.9869, 241.3109, 1066.778, 1067.487, 10000.0

    pt2 = depth / scale
    pt0 = (xmap - cx) * pt2 / fx
    pt1 = (ymap - cy) * pt2 / fy
    ref = np.stack([pt0, pt1, pt2], axis=-1)

    out = backproject_depth(
        jnp.asarray(depth), jnp.asarray(ymap), jnp.asarray(xmap),
        cx, cy, fx, fy, scale,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_transform_points_matches_numpy(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    q = _rand_quats(rng, 1)[0]
    r = tfs.quaternion_matrix(q)[:3, :3]
    t = rng.normal(size=3).astype(np.float32)
    ref = np.dot(pts, r.T) + t
    out = transform_points(jnp.asarray(pts), jnp.asarray(r), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_apply_pose_quat_consistency(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    q = jnp.asarray(_rand_quats(rng, 1)[0])
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    a = apply_pose_quat(jnp.asarray(pts), q, t)
    b = transform_points(jnp.asarray(pts), quat_to_matrix_df(q), t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_compose_pose_matches_matrix_composition(rng):
    qo, qi = jnp.asarray(_rand_quats(rng, 1)[0]), jnp.asarray(_rand_quats(rng, 1)[0])
    to = jnp.asarray(rng.normal(size=3))
    ti = jnp.asarray(rng.normal(size=3))
    qc, tc = compose_pose(qo, to, qi, ti)

    ro = np.asarray(quat_to_matrix_df(qo))
    ri = np.asarray(quat_to_matrix_df(qi))
    rc_ref = ro @ ri
    tc_ref = ro @ np.asarray(ti) + np.asarray(to)
    np.testing.assert_allclose(np.asarray(quat_to_matrix_df(qc)), rc_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), tc_ref, atol=1e-5)


def test_recenter_inverts_apply(rng):
    """recenter_points(apply_pose(p)) == p when rotation convention matches."""
    pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    q = jnp.asarray(_rand_quats(rng, 1)[0])
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    # world = p @ R.T + t ; recenter: (world - t) @ R = p
    world = apply_pose_quat(pts, q, t)
    back = recenter_points(world, q, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_quat_to_matrix_jits():
    f = jax.jit(quat_to_matrix)
    out = f(jnp.array([2.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), np.eye(3), atol=1e-6)


def test_gohlke_quaternion_from_matrix_roundtrip(rng):
    for _ in range(10):
        q = tfs.random_quaternion(rng.random(3))
        m = tfs.quaternion_matrix(q)
        q2 = tfs.quaternion_from_matrix(m)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-9)
