"""Refinement-loop and end-to-end pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp

from plr2_tpu.geometry.quaternion import normalize_quaternion, quat_to_matrix_df
from plr2_tpu.geometry.pointcloud import apply_pose_quat
from plr2_tpu.refine import initial_pose, iterative_refine
from plr2_tpu.pipeline import DenseFusionPipeline


def test_initial_pose_selects_argmax(rng):
    b, n = 2, 16
    pred_r = jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32))
    pred_t = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    pred_c = jnp.asarray(rng.uniform(size=(b, n, 1)).astype(np.float32))
    points = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    q, t = initial_pose(pred_r, pred_t, pred_c, points)
    which = np.asarray(pred_c)[..., 0].argmax(-1)
    for bi in range(b):
        i = which[bi]
        qe = np.asarray(normalize_quaternion(pred_r[bi, i]))
        np.testing.assert_allclose(np.asarray(q)[bi], qe, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(t)[bi],
            np.asarray(points)[bi, i] + np.asarray(pred_t)[bi, i], atol=1e-6)


def test_iterative_refine_converges_with_oracle_refiner(rng):
    """With an oracle refiner that returns the exact residual pose, one
    iteration must land on the ground truth."""
    n = 64
    model_pts = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32) * 0.05)
    q_gt = jnp.asarray(rng.normal(size=4).astype(np.float32))
    q_gt = normalize_quaternion(q_gt)
    t_gt = jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.1)
    cloud = apply_pose_quat(model_pts, q_gt, t_gt)  # observed points

    # perturbed initial pose
    q0 = normalize_quaternion(q_gt + 0.1)
    t0 = t_gt + 0.05

    def oracle_refiner(new_cloud, emb, obj):
        # solve the residual pose aligning model_pts -> new_cloud via Kabsch
        src = model_pts[0]
        dst = new_cloud[0]
        sc, dc = jnp.mean(src, 0), jnp.mean(dst, 0)
        # new_cloud = src @ Rres^T + tres (row-vector convention)
        h = (src - sc).T @ (dst - dc)
        u, s, vt = jnp.linalg.svd(h)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        rres = (vt.T * jnp.array([1.0, 1.0, d])) @ u.T
        tres = dc - sc @ rres.T
        from plr2_tpu.geometry.quaternion import matrix_to_quat
        dq = matrix_to_quat(rres)
        return dq[None, None, :], tres[None, None, :]

    q, t = iterative_refine(oracle_refiner, cloud, jnp.zeros((1, n, 32)),
                            jnp.zeros((1,), jnp.int32), q0[None], t0[None], 1)
    # final pose must map model points onto the observed cloud
    rec = apply_pose_quat(model_pts, q[0], t[0])
    err = float(jnp.abs(rec - cloud).max())
    assert err < 1e-4, err


def test_pipeline_estimate_shapes_and_jit():
    pipe = DenseFusionPipeline(num_points=32, num_objects=5)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=2)
    img = jnp.zeros((2, 48, 48, 3))
    cloud = jax.random.normal(jax.random.key(1), (2, 32, 3))
    choose = jax.random.randint(jax.random.key(2), (2, 32), 0, 48 * 48)
    obj = jnp.array([0, 4], dtype=jnp.int32)

    est = pipe.estimate(variables, img, cloud, choose, obj, refine_iterations=2)
    assert est.quat.shape == (2, 4)
    assert est.trans.shape == (2, 3)
    assert est.confidence.shape == (2,)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(est.quat), axis=-1), 1.0, atol=1e-5)
    # zero iterations must also work and give the PoseNet-only pose
    est0 = pipe.estimate(variables, img, cloud, choose, obj, refine_iterations=0)
    assert bool(jnp.isfinite(est0.quat).all())


def test_refine_composition_matches_host_reference(rng):
    """One scan step == the host-side numpy matrix composition of the
    reference eval driver."""
    from plr2_tpu.geometry import transformations as tfs
    n = 16
    cloud = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    emb = jnp.zeros((1, n, 32))
    q0 = normalize_quaternion(jnp.asarray(rng.normal(size=4).astype(np.float32)))
    t0 = jnp.asarray(rng.normal(size=3).astype(np.float32))
    dq_fixed = normalize_quaternion(jnp.asarray(rng.normal(size=4).astype(np.float32)))
    dt_fixed = jnp.asarray(rng.normal(size=3).astype(np.float32))

    def const_refiner(new_cloud, emb_, obj_):
        return dq_fixed[None, None, :], dt_fixed[None, None, :]

    q, t = iterative_refine(const_refiner, cloud, emb,
                            jnp.zeros((1,), jnp.int32), q0[None], t0[None], 1)

    # host-side reference composition (Gohlke 4x4 matrices)
    m1 = tfs.quaternion_matrix(np.asarray(q0))
    m1[:3, 3] = np.asarray(t0)
    m2 = tfs.quaternion_matrix(np.asarray(dq_fixed))
    m2[:3, 3] = np.asarray(dt_fixed)
    mf = m1 @ m2
    q_ref = tfs.quaternion_from_matrix(mf)
    t_ref = mf[:3, 3]

    qn = np.asarray(q[0])
    if np.dot(qn, q_ref) < 0:
        q_ref = -q_ref
    np.testing.assert_allclose(qn, q_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t[0]), t_ref, atol=1e-5)


def test_pipeline_init_respects_emb_dim():
    """init() must size the refiner's embedding input from emb_dim — a
    hardcoded 32 initialized refiner params that crashed at estimate time
    for any other embedding width (regression)."""
    pipe = DenseFusionPipeline(num_points=16, num_objects=2, emb_dim=16)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    k = variables["refiner"]["params"]["feat"]["e_conv1"]["kernel"]
    assert k.shape[0] == 16
    est = pipe.estimate(
        variables, jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32),
        refine_iterations=1)
    assert np.isfinite(np.asarray(est.quat)).all()
