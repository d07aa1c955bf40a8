"""Tensor-parallel (2-D data x model mesh) tests on the 8-virtual-device
CPU backend. The reference has no model parallelism (single-GPU torch);
parallel/tensor_parallel.py is a TPU-native capability addition — these
tests pin that the Megatron-style column/row sharding is numerically a
pure layout change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from plr2_tpu.parallel import (
    make_mesh, shard_batch, make_train_step, make_inference_step,
    tp_shardings, shard_variables, sharded_param_count)
from plr2_tpu.parallel.tensor_parallel import tp_spec
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


class _Key:
    def __init__(self, key):
        self.key = key


def _spec(*names):
    return tp_spec(tuple(_Key(n) for n in names))


def test_tp_spec_table():
    # column-parallel: out features sharded, bias sharded
    assert _spec("posenet", "params", "conv1_r", "kernel") == P(None, "model")
    assert _spec("posenet", "params", "conv1_r", "bias") == P("model")
    assert _spec("posenet", "params", "conv3_c", "kernel") == P(None, "model")
    assert _spec("posenet", "params", "feat", "conv5", "kernel") == P(None, "model")
    assert _spec("refiner", "params", "conv1_t", "kernel") == P(None, "model")
    # row-parallel: in features sharded, bias replicated
    assert _spec("posenet", "params", "conv2_t", "kernel") == P("model", None)
    assert _spec("posenet", "params", "conv2_t", "bias") == P()
    assert _spec("posenet", "params", "conv4_r", "kernel") == P("model", None)
    assert _spec("posenet", "params", "feat", "conv6", "kernel") == P("model", None)
    assert _spec("refiner", "params", "conv2_r", "kernel") == P("model", None)
    # replicated: CNN, small feat layers, refiner final head, batch stats
    assert _spec("posenet", "params", "cnn", "feats", "conv1", "kernel") == P()
    assert _spec("posenet", "params", "feat", "conv1", "kernel") == P()
    assert _spec("refiner", "params", "conv3_r", "kernel") == P()
    assert _spec("posenet", "batch_stats", "cnn", "bn1", "mean") == P()


def test_tp_divisibility_guard():
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    bad = {"posenet": {"params": {"conv1_r": {"kernel": np.zeros((10, 6))}}}}
    with pytest.raises(ValueError, match="not divisible"):
        tp_shardings(mesh, bad)


def test_tp_train_step_matches_single_device():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    batch = _make_batch(8, 32, 16, 48, 4, jax.random.key(1))
    assert sharded_param_count(variables) > 5_000_000  # the big ladders

    init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4)
    v1, o1, m1 = step(variables, init_fn(variables), batch, jax.random.key(2))

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    vs = shard_variables(mesh, variables)
    opt = init_fn(vs)  # zeros_like inherits the param shardings
    mu = opt[0].mu["conv1_r"]["kernel"]
    assert mu.sharding.spec == P(None, "model")
    v2, o2, m2 = step(vs, opt, shard_batch(mesh, batch), jax.random.key(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(v1["posenet"]["params"]),
                    jax.tree_util.tree_leaves(v2["posenet"]["params"])):
        # reduction-order float noise amplified by Adam's normalizer
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-4)
    # updated params keep their tensor-parallel layout (no silent
    # resharding feedback loop step-to-step)
    k2 = v2["posenet"]["params"]["conv1_r"]["kernel"]
    assert k2.sharding.spec == P(None, "model")
    v3, _, _ = step(v2, o2, shard_batch(mesh, batch), jax.random.key(3))
    assert (v3["posenet"]["params"]["conv1_r"]["kernel"].sharding
            == k2.sharding)


def test_tp_refine_stage_step():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    vs = shard_variables(mesh, variables)
    init_fn, step = make_train_step(pipe, sym_list=(1,), w=0.015, lr=1e-4,
                                    refine_iterations=2)
    batch = shard_batch(mesh, _make_batch(8, 32, 16, 48, 4, jax.random.key(3)))
    v, o, m = step(vs, init_fn(vs), batch, jax.random.key(4))
    assert np.isfinite(float(m["loss"]))
    assert (v["refiner"]["params"]["conv1_r"]["kernel"].sharding.spec
            == P(None, "model"))


def test_tp_inference_matches_single_device():
    pipe = DenseFusionPipeline(num_points=32, num_objects=4)
    variables = pipe.init(jax.random.key(0), crop_hw=48, batch=1)
    b = _make_batch(16, 32, 16, 48, 4, jax.random.key(5))
    args = [b[k] for k in ("img", "points", "choose", "idx")]

    infer = make_inference_step(pipe, refine_iterations=2)
    est1 = infer(variables, *args)

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    vs = shard_variables(mesh, variables)
    data = jax.sharding.NamedSharding(mesh, P("data"))
    est2 = infer(vs, *(jax.device_put(a, data) for a in args))
    np.testing.assert_allclose(np.asarray(est1.quat), np.asarray(est2.quat),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(est1.trans), np.asarray(est2.trans),
                               atol=1e-5)


def test_batch_trainer_tp_epoch_matches_single_device():
    """BatchTrainer with model_parallel=4, data_parallel=2: one real epoch
    (preprocessing, curriculum plumbing) matches the unsharded trainer."""
    from plr2_tpu.config import (DatasetConfig, ModelConfig, PipelineConfig,
                                 TrainConfig)
    from plr2_tpu.data import SyntheticPoseDataset
    from plr2_tpu.train import BatchTrainer

    def run(dp, mp):
        cfg = PipelineConfig(
            dataset=DatasetConfig(name="synthetic", num_points=64,
                                  num_objects=2, num_mesh_points=64,
                                  sym_list=(1,), crop_size=48),
            model=ModelConfig(num_points=64, num_objects=2),
            train=TrainConfig(batch_size=8, nepoch=1),
            data_parallel=dp, model_parallel=mp)
        ds = SyntheticPoseDataset(num_frames=2, num_objects=2,
                                  model_points=64, num_points=64, seed=9)
        tr = BatchTrainer(cfg)
        state = tr.init_state(jax.random.key(0), crop_hw=48)
        state, info = tr.train_epoch(state, ds, jax.random.key(1))
        return state, info

    s1, i1 = run(1, 1)
    s8, i8 = run(2, 4)
    np.testing.assert_allclose(i1["train_loss"], i8["train_loss"], rtol=2e-4)
    for x, y in zip(jax.tree_util.tree_leaves(s1.variables["posenet"]["params"]),
                    jax.tree_util.tree_leaves(s8.variables["posenet"]["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2.5e-4)
