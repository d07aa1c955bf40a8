"""Composed parallelism meshes on the 8-virtual-device CPU backend
(VERDICT r4 missing #4): the single-axis recipes — dp (batch over
`data`), tp (Megatron column/row weight sharding over `model`,
parallel/tensor_parallel.py), sp (point shards over `points`,
parallel/point_parallel.py), pp (refinement ring over `pipe`,
parallel/pipeline_parallel.py) — are each pinned in their own test
modules; these tests pin their COMPOSITIONS, where GSPMD + shard_map
axis interactions live:

* (data=2, model=2, points=2): one training step with the batch sharded
  over `data` (manual), the fusion-trunk/head weights tensor-parallel
  over `model` (auto — GSPMD propagates the committed shardings through
  the shard_map body), and the sampled cloud sharded over `points`
  (manual). Joint refine stage pinned exactly vs the single-device step;
  stage-1 pinned by layout invariance at fixed data-axis size (the
  composed dropout semantics draw per-data-shard masks, so the
  single-device comparison is the BN stats — dropout-independent, all BN
  sits in the ResNet trunk before the first Dropout).
* (data, pipe): pipelined refinement with each data shard running its
  own ring slice; pinned vs the single-device iterative refine.

The reference is single-GPU torch — no composed meshes to mirror
(SURVEY.md section 2 parallelism table).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plr2_tpu.parallel import (make_mesh, make_pp_estimate_step,
                               make_train_step, shard_variables)
from plr2_tpu.parallel.point_parallel import make_sp_train_step
from plr2_tpu.pipeline import DenseFusionPipeline


@pytest.fixture(scope="module")
def pipe():
    return DenseFusionPipeline(num_points=64, num_objects=5)


@pytest.fixture(scope="module")
def variables(pipe):
    return pipe.init(jax.random.key(0), crop_hw=48, batch=1)


def _batch(b=4, n=64, m=32, seed=1):
    ks = jax.random.split(jax.random.key(seed), 4)
    return {
        "img": jax.random.normal(ks[0], (b, 48, 48, 3)),
        "points": jax.random.normal(ks[1], (b, n, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (b, n), 0, 48 * 48),
        "target": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "idx": jnp.arange(b, dtype=jnp.int32) % 5,
    }


def test_composed_joint_refine_matches_single_device(pipe, variables):
    """(data=2, model=2, points=2) joint-stage training step == the plain
    single-device step: the frozen PoseNet runs in eval mode (running-
    average BN, no dropout), so the composed program is bit-for-bit the
    same math up to reduction order."""
    mesh = make_mesh(8, ("data", "model", "points"), shape=(2, 2, 2))
    vs = shard_variables(mesh, variables)
    batch = _batch(seed=4)

    init_ref, step_ref = make_train_step(pipe, sym_list=(1,), w=0.015,
                                         lr=1e-4, refine_iterations=2)
    init_c, step_c = make_sp_train_step(pipe, mesh, sym_list=(1,),
                                        w=0.015, lr=1e-4,
                                        refine_iterations=2,
                                        data_axis="data")
    key = jax.random.key(5)
    v1, _, m1 = step_ref(variables, init_ref(variables), batch, key)
    v2, _, m2 = step_c(vs, init_c(vs), batch, key)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m2["dis"]), float(m1["dis"]), rtol=1e-5)
    for p1, p2 in zip(jax.tree_util.tree_leaves(v1["refiner"]["params"]),
                      jax.tree_util.tree_leaves(v2["refiner"]["params"])):
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   atol=2e-5, rtol=0)
    # the tensor-parallel weight shardings must survive the step (GSPMD
    # propagated them through the manual data/points body)
    sharded = [l for l in jax.tree_util.tree_leaves(v2["refiner"]["params"])
               if any(ax == "model"
                      for ax in getattr(l.sharding, "spec", ()) if ax)]
    assert sharded, "refiner params lost their tensor-parallel sharding"
    # the frozen PoseNet must be bitwise untouched
    for s1, s2 in zip(jax.tree_util.tree_leaves(variables["posenet"]),
                      jax.tree_util.tree_leaves(v2["posenet"])):
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))


def test_composed_stage1_layout_invariance_and_bn(pipe, variables):
    """Stage-1 training on (data=2, model=2, points=2) vs (data=2,
    model=1, points=1): same data-axis size -> identical per-shard
    dropout masks and synced-BN moments, so tp x sp machinery is the ONLY
    difference — loss, updated params, and BN stats must agree. The BN
    stats are additionally pinned against the plain single-device step:
    every BatchNorm sits in the ResNet trunk BEFORE the first Dropout, so
    the synced moments must equal the global-batch moments regardless of
    the dropout semantics divergence."""
    mesh3 = make_mesh(8, ("data", "model", "points"), shape=(2, 2, 2))
    mesh1 = make_mesh(2, ("data", "model", "points"), shape=(2, 1, 1))
    batch = _batch(seed=7)
    key = jax.random.key(9)

    init_a, step_a = make_sp_train_step(pipe, mesh3, sym_list=(1,),
                                        w=0.015, lr=1e-4, data_axis="data")
    init_b, step_b = make_sp_train_step(pipe, mesh1, sym_list=(1,),
                                        w=0.015, lr=1e-4, data_axis="data")
    va = shard_variables(mesh3, variables)
    v1, _, m1 = step_a(va, init_a(va), batch, key)
    v2, _, m2 = step_b(variables, init_b(variables), batch, key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m1["dis"]), float(m2["dis"]), rtol=1e-5)
    for p1, p2 in zip(jax.tree_util.tree_leaves(v1["posenet"]["params"]),
                      jax.tree_util.tree_leaves(v2["posenet"]["params"])):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   atol=2e-5, rtol=0)

    # BN stats vs the plain single-device step (dropout-independent)
    init_r, step_r = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4)
    v3, _, _ = step_r(variables, init_r(variables), batch, key)
    for s1, s3 in zip(
            jax.tree_util.tree_leaves(v1["posenet"]["batch_stats"]),
            jax.tree_util.tree_leaves(v3["posenet"]["batch_stats"])):
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s3),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dp,pp,micro", [(2, 4, 2), (4, 2, 2)])
def test_composed_data_pipe_refine_matches_single_device(pipe, variables,
                                                         dp, pp, micro):
    """(data, pipe) pipelined estimation == single-device iterative
    refine with stages*iters_per_stage iterations; each data shard's ring
    slice never communicates over `data`."""
    mesh = make_mesh(8, ("data", "pipe"), shape=(dp, pp))
    b, n = 8, 64
    ks = jax.random.split(jax.random.key(11), 3)
    img = jax.random.normal(ks[0], (b, 48, 48, 3))
    cloud = jax.random.normal(ks[1], (b, n, 3)) * 0.1
    choose = jax.random.randint(ks[2], (b, n), 0, 48 * 48)
    obj = jnp.arange(b, dtype=jnp.int32) % 5

    ref = pipe.estimate(variables, img, cloud, choose, obj,
                        refine_iterations=pp)
    step = make_pp_estimate_step(pipe, mesh, num_micro=micro,
                                 batch_axis="data")
    est = step(variables, img, cloud, choose, obj)
    np.testing.assert_allclose(np.asarray(est.trans), np.asarray(ref.trans),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(est.quat), np.asarray(ref.quat),
                               rtol=1e-4, atol=1e-5)
