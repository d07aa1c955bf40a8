"""Mesh / data-parallel tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plr2_tpu.parallel import (
    make_mesh, batch_sharding, shard_batch, make_train_step,
    make_inference_step)
from plr2_tpu.pipeline import DenseFusionPipeline


def _make_batch(b, n, m, hw, num_obj, key):
    ks = jax.random.split(key, 4)
    return {
        "img": jax.random.normal(ks[0], (b, hw, hw, 3)),
        "points": jax.random.normal(ks[1], (b, n, 3)) * 0.1,
        "choose": jax.random.randint(ks[2], (b, n), 0, hw * hw),
        "target": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "model_points": jax.random.normal(ks[3], (b, m, 3)) * 0.05,
        "idx": jnp.arange(b, dtype=jnp.int32) % num_obj,
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_train_step_runs_and_matches_single_device():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    batch = _make_batch(8, 32, 16, 48, 4, jax.random.key(1))

    # single-device step
    init_s, step_s = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4)
    opt_s = init_s(variables)
    v1, o1, m1 = step_s(variables, opt_s, batch, jax.random.key(2))

    # mesh-sharded step over 8 devices
    mesh = make_mesh()
    init_m, step_m = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                     mesh=mesh)
    opt_m = init_m(variables)
    sharded_batch = shard_batch(mesh, batch)
    v2, o2, m2 = step_m(variables, opt_m, sharded_batch, jax.random.key(2))

    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(v1["posenet"]["params"])[0]
    b = jax.tree_util.tree_leaves(v2["posenet"]["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_train_step_with_refine_stage():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    mesh = make_mesh()
    init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                    refine_iterations=2, mesh=mesh)
    opt = init_fn(variables)
    batch = shard_batch(mesh, _make_batch(8, 32, 16, 48, 4, jax.random.key(3)))
    v, o, m = step(variables, opt, batch, jax.random.key(4))
    assert np.isfinite(float(m["loss"]))


def test_sharded_inference_step():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    mesh = make_mesh()
    infer = make_inference_step(pipe, refine_iterations=2, mesh=mesh)
    b = _make_batch(16, 32, 16, 48, 4, jax.random.key(5))
    est = infer(variables, *(jax.device_put(b[k], batch_sharding(mesh))
                             for k in ("img", "points", "choose", "idx")))
    assert est.quat.shape == (16, 4)
    assert bool(jnp.isfinite(est.quat).all())
    # output really is sharded over the data axis
    assert len(est.quat.sharding.device_set) == 8


def test_train_step_with_remat_matches_plain():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    batch = _make_batch(4, 32, 16, 48, 4, jax.random.key(7))
    init_a, step_a = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4)
    init_b, step_b = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                     remat=True)
    va, oa, ma = step_a(variables, init_a(variables), batch, jax.random.key(1))
    vb, ob, mb = step_b(variables, init_b(variables), batch, jax.random.key(1))
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    a = jax.tree_util.tree_leaves(va["posenet"]["params"])[0]
    b = jax.tree_util.tree_leaves(vb["posenet"]["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_refine_stage_trains_refiner_and_freezes_posenet():
    """Regression: with refine_iterations > 0 the batched step must update
    the REFINER (the first version differentiated only posenet params,
    leaving the refiner at random init forever)."""
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-3,
                                    refine_iterations=2)
    opt = init_fn(variables)
    batch = _make_batch(4, 32, 16, 48, 4, jax.random.key(9))
    pose_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), variables["posenet"])
    ref_before = jax.tree_util.tree_leaves(variables["refiner"]["params"])[0].copy()
    v, o, m = step(variables, opt, batch, jax.random.key(1))
    ref_after = jax.tree_util.tree_leaves(v["refiner"]["params"])[0]
    assert not np.allclose(np.asarray(ref_before), np.asarray(ref_after))
    # posenet params AND batch stats untouched (frozen eval-mode forward)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(pose_before)[0],
            jax.tree_util.tree_flatten_with_path(v["posenet"])[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_batch_trainer_e2e_fit_on_mesh():
    """End-to-end `fit` through the CLI's batched path: BatchTrainer over
    an 8-device mesh — real preprocessing, curriculum, checkpoint gating."""
    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.data import SyntheticPoseDataset
    from plr2_tpu.train import BatchTrainer

    cfg = PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=64, num_objects=2,
                              num_mesh_points=64, sym_list=(1,),
                              crop_size=48),
        model=ModelConfig(num_points=64, num_objects=2),
        train=TrainConfig(batch_size=16, nepoch=2),
        data_parallel=8)
    ds = SyntheticPoseDataset(num_frames=4, num_objects=2, model_points=64,
                              num_points=64, seed=7)
    tr = BatchTrainer(cfg)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    state = tr.init_state(jax.random.key(0), crop_hw=48)
    saves = []
    state = tr.fit(state, ds, ds, jax.random.key(1), epochs=2,
                   log_fn=lambda m: None,
                   checkpoint_fn=lambda s, d: saves.append(d))
    assert state.epoch == 2
    assert np.isfinite(state.best_test)
    assert saves, "best-metric checkpoint hook never fired"


def test_batch_trainer_single_device_matches_mesh():
    """The same batched step on mesh vs no mesh produces identical
    parameter updates (mesh only changes layout, not math)."""
    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.data import SyntheticPoseDataset
    from plr2_tpu.train import BatchTrainer

    def run(dp):
        cfg = PipelineConfig(
            dataset=DatasetConfig(name="synthetic", num_points=64,
                                  num_objects=2, num_mesh_points=64,
                                  sym_list=(1,), crop_size=48),
            model=ModelConfig(num_points=64, num_objects=2),
            train=TrainConfig(batch_size=8, nepoch=1),
            data_parallel=dp)
        ds = SyntheticPoseDataset(num_frames=2, num_objects=2,
                                  model_points=64, num_points=64, seed=9)
        tr = BatchTrainer(cfg)
        state = tr.init_state(jax.random.key(0), crop_hw=48)
        state, info = tr.train_epoch(state, ds, jax.random.key(1))
        return state, info

    s1, i1 = run(1)
    s8, i8 = run(8)
    np.testing.assert_allclose(i1["train_loss"], i8["train_loss"],
                               rtol=2e-4)
    a = jax.tree_util.tree_leaves(s1.variables["posenet"]["params"])
    b = jax.tree_util.tree_leaves(s8.variables["posenet"]["params"])
    # Adam's first step is ~ -lr*sign(grad); a near-zero gradient whose
    # cross-device reduction order flips its sign moves a weight by
    # exactly 2*lr (2e-4). Allow that float-nondeterminism margin — real
    # sharding bugs diverge by far more.
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2.5e-4)


def test_sym_slots_step_matches_full_on_mesh():
    """Compacted mixed-batch ADD-S (sym_slots) under a sharded step: same
    loss and same updated params as the full path, batch mixed 3-sym/8."""
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    batch = _make_batch(8, 32, 16, 48, 4, jax.random.key(1))
    batch["idx"] = jnp.asarray([1, 0, 1, 2, 3, 1, 0, 2], jnp.int32)  # 3 sym

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    outs = []
    for slots in (None, 4):
        init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015,
                                        lr=1e-4, mesh=mesh, sym_slots=slots)
        v, o, m = step(variables, init_fn(variables), sharded,
                       jax.random.key(2))
        outs.append((float(m["loss"]), v))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    # atol headroom: the compact branch re-transforms its K slots, which
    # XLA may fuse with different fma grouping -> ulp-level loss diffs
    # that the Adam normalizer amplifies to ~1e-6 on isolated params
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]["posenet"]["params"]),
                    jax.tree_util.tree_leaves(outs[1][1]["posenet"]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_trainer_auto_sym_slots():
    """sym_slots=-1 sizes the compaction from the dataset's symmetric
    fraction and stays within (0, batch)."""
    import dataclasses
    from plr2_tpu.config import get_preset
    from plr2_tpu.train import BatchTrainer

    cfg = get_preset("ycb_train")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, sym_slots=-1, batch_size=16))
    tr = BatchTrainer(cfg)
    slots = tr._sym_slots()
    # 5 of 21 YCB objects are symmetric -> 2*ceil(16*5/21) = 8
    assert slots == 8
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, sym_slots=0))
    assert BatchTrainer(cfg2)._sym_slots() is None
