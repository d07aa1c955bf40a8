"""Config preset and pipeline-surface tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plr2_tpu.config import PRESETS, get_preset


def test_all_presets_construct():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.model.num_points == cfg.dataset.num_points
        assert cfg.model.num_objects == cfg.dataset.num_objects


def test_preset_contract_values():
    """The BASELINE.json behavior contract (SURVEY.md section 5.6)."""
    lm = get_preset("linemod_train")
    assert lm.dataset.num_points == 500
    assert lm.dataset.num_objects == 13
    assert lm.dataset.sym_list == (7, 8)
    ycb = get_preset("ycb_refine")
    assert ycb.dataset.num_points == 1000
    assert ycb.dataset.num_objects == 21
    assert ycb.dataset.sym_list == (12, 15, 18, 19, 20)
    for cfg in (lm, ycb):
        t = cfg.train
        assert (t.lr, t.w) == (1e-4, 0.015)
        assert (t.lr_rate, t.w_rate) == (0.3, 0.3)
        assert (t.decay_margin, t.refine_margin) == (0.016, 0.013)
        assert t.batch_size == 8 and t.nepoch == 500
    assert get_preset("full_pipeline").eval_refine_iterations == 4


def test_pipeline_bf16_cast_mode():
    from plr2_tpu.pipeline import DenseFusionPipeline

    pipe32 = DenseFusionPipeline(num_points=16, num_objects=3)
    v = pipe32.init(jax.random.key(0), crop_hw=48, batch=1)
    vb = DenseFusionPipeline.cast_variables(v)
    leaves = jax.tree_util.tree_leaves(vb)
    assert all(l.dtype in (jnp.bfloat16, jnp.int32) for l in leaves)

    pipe16 = DenseFusionPipeline(num_points=16, num_objects=3,
                                 dtype=jnp.bfloat16)
    img = jnp.zeros((1, 48, 48, 3), jnp.bfloat16)
    cloud = jnp.zeros((1, 16, 3), jnp.bfloat16)
    choose = jnp.zeros((1, 16), jnp.int32)
    obj = jnp.zeros((1,), jnp.int32)
    est = pipe16.estimate(vb, img, cloud, choose, obj, refine_iterations=1)
    assert bool(jnp.isfinite(est.quat.astype(jnp.float32)).all())


def test_checkpoint_tags_are_independent(tmp_path):
    from plr2_tpu.train import CheckpointManager, Trainer
    from plr2_tpu.config import PipelineConfig, ModelConfig, DatasetConfig

    cfg = PipelineConfig(
        dataset=DatasetConfig(num_points=16, num_objects=3, sym_list=()),
        model=ModelConfig(num_points=16, num_objects=3))
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=48)
    ckpt = CheckpointManager(str(tmp_path))
    state.epoch = 3
    ckpt.save(state, 0.5, tag="best")
    state.epoch = 7
    ckpt.save(state, 0.9, tag="last")
    assert ckpt.restore("best")["meta"]["epoch"] == 3
    assert ckpt.restore("last")["meta"]["epoch"] == 7
    assert ckpt.restore("missing") is None


def test_yaml_configs_roundtrip_new_model_fields(tmp_path):
    """Every shipped YAML config must load against the current ModelConfig
    (including fields added after the file was written, e.g.
    phase_upsample), and explicit overrides must stick through a
    save/load round-trip."""
    import dataclasses
    import glob
    import os

    from plr2_tpu.config_io import load_config, save_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(repo, "configs", "*.yml")))
    assert files, "no shipped configs found"
    for f in files:
        cfg = load_config(f)
        assert isinstance(cfg.model.phase_upsample, bool)

    cfg = load_config(files[0])
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, phase_upsample=False))
    out = tmp_path / "override.yml"
    save_config(cfg, str(out))
    back = load_config(str(out))
    assert back.model.phase_upsample is False
