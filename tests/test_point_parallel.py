"""Sequence (point-axis) parallelism tests on the 8-virtual-device CPU
backend. The reference has no sequence parallelism (single-GPU torch, the
"sequence" is the fixed 500/1000-point cloud — SURVEY.md section 2
parallelism table); parallel/point_parallel.py is the TPU-native scale-out
path for point counts / target meshes beyond one chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plr2_tpu.ops.knn import chamfer_min_distance
from plr2_tpu.parallel import make_mesh, make_train_step
from plr2_tpu.parallel.point_parallel import (
    _pad_wrap, make_sp_inference_step, make_sp_train_step, sp_chamfer)
from plr2_tpu.pipeline import DenseFusionPipeline


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, ("points",))


def test_pad_wrap_repeats_first_row():
    t = jnp.arange(15, dtype=jnp.float32).reshape(5, 3)
    p = _pad_wrap(t, 4)
    assert p.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(p[5:]),
                                  np.tile(np.asarray(t[:1]), (3, 1)))
    assert _pad_wrap(t, 5) is t


@pytest.mark.parametrize("m2", [53, 64])  # non-divisible (wrap pad) + even
def test_sp_chamfer_matches_single_device(mesh, m2):
    k = jax.random.split(jax.random.key(0), 2)
    pred = jax.random.normal(k[0], (4, 96, 3))
    target = jax.random.normal(k[1], (m2, 3))
    ref = np.asarray(chamfer_min_distance(pred, target))
    sp = np.asarray(sp_chamfer(mesh, pred, target))
    # matched coords are bitwise equal; the final norm may round one ulp
    # differently across program fusions (module docstring)
    np.testing.assert_allclose(sp, ref, rtol=1e-6, atol=0)


def test_sp_chamfer_gradient_matches(mesh):
    k = jax.random.split(jax.random.key(3), 2)
    pred = jax.random.normal(k[0], (2, 64, 3))
    target = jax.random.normal(k[1], (40, 3))
    g_ref = jax.grad(lambda p: jnp.sum(chamfer_min_distance(p, target)))(pred)
    g_sp = jax.grad(lambda p: jnp.sum(sp_chamfer(mesh, p, target)))(pred)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # target is GT: no gradient should flow into it
    gt = jax.grad(lambda t: jnp.sum(sp_chamfer(mesh, pred, t)))(target)
    np.testing.assert_array_equal(np.asarray(gt), 0.0)


def test_sp_chamfer_exact_coincidence_no_nan(mesh):
    # pred point exactly on a target point: distance 0, gradient 0
    target = jnp.asarray([[0.1, 0.2, 0.3], [1.0, 1.0, 1.0]] * 4)
    pred = jnp.broadcast_to(target[0], (1, 8, 3))
    dis = sp_chamfer(mesh, pred, target)
    np.testing.assert_array_equal(np.asarray(dis), 0.0)
    g = jax.grad(lambda p: jnp.sum(sp_chamfer(mesh, p, target)))(pred)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_sp_train_step_matches_single_device(mesh):
    """Stage-1 training with the point axis sharded: loss, metric,
    updated params, and BN stats match the unsharded step (the loss is a
    mean over (B, N) points — pmean of equal-sized local means)."""
    pipe = DenseFusionPipeline(num_points=64, num_objects=5)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    ks = jax.random.split(jax.random.key(1), 4)
    b, n, m = 4, 64, 32
    batch = {
        "img": jax.random.normal(ks[0], (b, 48, 48, 3)),
        "points": jax.random.normal(ks[1], (b, n, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (b, n), 0, 48 * 48),
        "target": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "idx": jnp.arange(b, dtype=jnp.int32) % 5,
    }
    init_ref, step_ref = make_train_step(pipe, sym_list=(1,), w=0.015,
                                         lr=1e-4)
    init_sp, step_sp = make_sp_train_step(pipe, mesh, sym_list=(1,),
                                          w=0.015, lr=1e-4)
    key = jax.random.key(2)
    v1, _, m1 = step_ref(variables, init_ref(variables), batch, key)
    v2, _, m2 = step_sp(variables, init_sp(variables), batch, key)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m2["dis"]), float(m1["dis"]), rtol=1e-5)
    # params after one Adam step (grad ulps inflate through the
    # normalizer, hence the atol); BN stats come from the replicated CNN
    # and must be bitwise identical
    for p1, p2 in zip(jax.tree_util.tree_leaves(v1["posenet"]["params"]),
                      jax.tree_util.tree_leaves(v2["posenet"]["params"])):
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=2e-5, rtol=0)
    for s1, s2 in zip(
            jax.tree_util.tree_leaves(v1["posenet"]["batch_stats"]),
            jax.tree_util.tree_leaves(v2["posenet"]["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))


def test_sp_refine_train_step_matches_single_device(mesh):
    """Joint-stage training with the point axis sharded: the re-centred
    new_points/new_target handoff selects the cross-shard best-confidence
    hypothesis with invariant collectives under stop_gradient (VERDICT r3
    item 3). Loss, per-iteration metric, and the refiner params after one
    full Adam step must match the data-parallel step; PoseNet variables
    (params AND eval-mode BN stats) must be bitwise untouched."""
    pipe = DenseFusionPipeline(num_points=64, num_objects=5)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    ks = jax.random.split(jax.random.key(4), 4)
    b, n, m = 4, 64, 32
    batch = {
        "img": jax.random.normal(ks[0], (b, 48, 48, 3)),
        "points": jax.random.normal(ks[1], (b, n, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (b, n), 0, 48 * 48),
        "target": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "idx": jnp.arange(b, dtype=jnp.int32) % 5,
    }
    init_ref, step_ref = make_train_step(pipe, sym_list=(1,), w=0.015,
                                         lr=1e-4, refine_iterations=2)
    init_sp, step_sp = make_sp_train_step(pipe, mesh, sym_list=(1,),
                                          w=0.015, lr=1e-4,
                                          refine_iterations=2)
    key = jax.random.key(5)
    v1, _, m1 = step_ref(variables, init_ref(variables), batch, key)
    v2, _, m2 = step_sp(variables, init_sp(variables), batch, key)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m2["dis"]), float(m1["dis"]), rtol=1e-5)
    for p1, p2 in zip(jax.tree_util.tree_leaves(v1["refiner"]["params"]),
                      jax.tree_util.tree_leaves(v2["refiner"]["params"])):
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=2e-5, rtol=0)
    # the frozen PoseNet must be bitwise untouched on both paths
    for s1, s2 in zip(jax.tree_util.tree_leaves(variables["posenet"]),
                      jax.tree_util.tree_leaves(v2["posenet"])):
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))


def test_sp_inference_step_matches_pipeline(mesh):
    pipe = DenseFusionPipeline(num_points=64, num_objects=5)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    ks = jax.random.split(jax.random.key(1), 3)
    b, n = 4, 64
    img = jax.random.normal(ks[0], (b, 48, 48, 3))
    cloud = jax.random.normal(ks[1], (b, n, 3)) * 0.1
    choose = jax.random.randint(ks[2], (b, n), 0, 48 * 48)
    obj = jnp.arange(b, dtype=jnp.int32) % 5

    ref = pipe.estimate(variables, img, cloud, choose, obj,
                        refine_iterations=2)
    step = make_sp_inference_step(pipe, mesh, refine_iterations=2)
    sp = step(variables, img, cloud, choose, obj)
    # pmean reassociates the global pools -> small float drift only
    np.testing.assert_allclose(np.asarray(sp.quat), np.asarray(ref.quat),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.confidence),
                               np.asarray(ref.confidence),
                               rtol=1e-5, atol=1e-6)
