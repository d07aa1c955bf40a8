"""Pipeline-parallel refinement tests on the 8-virtual-device CPU backend.
The reference runs refinement iterations sequentially in host Python on one
GPU (upstream tools/eval_ycb.py loop [upstream, mount empty]);
parallel/pipeline_parallel.py streams frame microbatches through a ring of
stages — one refinement iteration per chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plr2_tpu.parallel import make_mesh
from plr2_tpu.parallel.pipeline_parallel import (
    make_pp_estimate_step, make_pp_refine)
from plr2_tpu.pipeline import DenseFusionPipeline
from plr2_tpu.refine.iterative import initial_pose, iterative_refine


def _setup(b, n=64, num_obj=5, crop=48, seed=1):
    pipe = DenseFusionPipeline(num_points=n, num_objects=num_obj)
    variables = pipe.init(jax.random.key(0), crop_hw=crop, batch=1)
    ks = jax.random.split(jax.random.key(seed), 3)
    img = jax.random.normal(ks[0], (b, crop, crop, 3))
    cloud = jax.random.normal(ks[1], (b, n, 3)) * 0.1
    choose = jax.random.randint(ks[2], (b, n), 0, crop * crop)
    obj = jnp.arange(b, dtype=jnp.int32) % num_obj
    return pipe, variables, (img, cloud, choose, obj)


@pytest.mark.parametrize("num_micro", [1, 4, 8])
def test_pp_estimate_matches_single_device(num_micro):
    mesh = make_mesh(8, ("pipe",))  # 8 stages == 8 refine iterations
    b = 8
    pipe, variables, (img, cloud, choose, obj) = _setup(b)
    ref = pipe.estimate(variables, img, cloud, choose, obj,
                        refine_iterations=8)
    step = make_pp_estimate_step(pipe, mesh, num_micro=num_micro)
    pp = step(variables, img, cloud, choose, obj)
    # identical per-microbatch arithmetic; only fusion-level rounding
    np.testing.assert_allclose(np.asarray(pp.quat), np.asarray(ref.quat),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp.trans), np.asarray(ref.trans),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp.confidence),
                               np.asarray(ref.confidence),
                               rtol=1e-6, atol=1e-7)


def test_pp_refine_two_stage_mesh():
    # 2-D layout: 2 pipeline stages (= 2-iteration reference protocol);
    # the other axis is unused here, pinning that pp composes with a
    # larger mesh without requiring all devices on the ring
    mesh2 = make_mesh(8, ("pipe", "unused"), shape=(2, 4))
    b, num_micro = 6, 3
    pipe, variables, (img, cloud, choose, obj) = _setup(b, seed=7)
    pred_r, pred_t, pred_c, emb = pipe.posenet.apply(
        variables["posenet"], img, cloud, choose, obj)
    q0, t0 = initial_pose(pred_r, pred_t, pred_c, cloud)

    def refiner_fn(nc, e, o):
        return pipe.refiner.apply(variables["refiner"], nc, e, o)

    q_ref, t_ref = iterative_refine(refiner_fn, cloud, emb, obj, q0, t0, 2)

    refine = make_pp_refine(pipe.refiner, mesh2, num_micro=num_micro)
    split = lambda x: x.reshape((num_micro, -1) + x.shape[1:])  # noqa: E731
    q_pp, t_pp = refine(variables["refiner"], split(cloud), split(emb),
                        split(obj), split(q0), split(t0))
    np.testing.assert_allclose(np.asarray(q_pp).reshape(b, 4),
                               np.asarray(q_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_pp).reshape(b, 3),
                               np.asarray(t_ref), rtol=1e-5, atol=1e-5)

    # 2 stages x 2 iterations each == the 4-iteration serving protocol
    q_ref4, t_ref4 = iterative_refine(refiner_fn, cloud, emb, obj, q0, t0, 4)
    refine4 = make_pp_refine(pipe.refiner, mesh2, num_micro=num_micro,
                             iters_per_stage=2)
    q_pp4, t_pp4 = refine4(variables["refiner"], split(cloud), split(emb),
                           split(obj), split(q0), split(t0))
    np.testing.assert_allclose(np.asarray(q_pp4).reshape(b, 4),
                               np.asarray(q_ref4), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_pp4).reshape(b, 3),
                               np.asarray(t_ref4), rtol=1e-5, atol=1e-5)
