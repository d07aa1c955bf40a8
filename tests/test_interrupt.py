"""Graceful-preemption handling (utils/interrupt.py + Trainer.fit stop_fn).

The reference restarts only via manual --resume_* flags (SURVEY.md
section 5.3 — no failure detection upstream); these tests pin the
TPU-native addition: a latched SIGTERM stops training at a sample
boundary with 'last' saved and the interrupted epoch rolled back, so
auto-resume replays at most one epoch.
"""

import os
import signal

import jax
import pytest

from plr2_tpu.config import (
    DatasetConfig, ModelConfig, PipelineConfig, TrainConfig)
from plr2_tpu.data import SyntheticPoseDataset
from plr2_tpu.train import Trainer
from plr2_tpu.utils.interrupt import GracefulInterrupt


def _tiny_config(**train_kw):
    # mirrors tests/test_train_eval.py's shapes so the compiled step
    # programs are shared via the persistent CPU compile cache
    return PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=96, num_objects=4,
                              num_mesh_points=128, sym_list=(1,),
                              add_noise=True),
        model=ModelConfig(num_points=96, num_objects=4),
        train=TrainConfig(batch_size=2, refine_iterations=2, **train_kw),
    )


@pytest.fixture(scope="module")
def tiny_ds():
    return SyntheticPoseDataset(num_frames=2, num_objects=2,
                                model_points=128, num_points=96, seed=1)


def test_graceful_interrupt_latches_first_signal_and_restores_handlers():
    before = signal.getsignal(signal.SIGTERM)
    with GracefulInterrupt() as stop:
        assert not stop and not stop()
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop and stop() and stop.requested
        # second signal escalates to an immediate abort
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGTERM)
    assert signal.getsignal(signal.SIGTERM) is before


def test_graceful_interrupt_sigint_and_programmatic_request():
    with GracefulInterrupt(signals=(signal.SIGINT,)) as stop:
        os.kill(os.getpid(), signal.SIGINT)
        assert stop()
    with GracefulInterrupt() as stop:
        stop.request()
        assert stop()


def test_fit_stops_mid_epoch_rolls_back_and_saves_last(tiny_ds):
    cfg = _tiny_config(nepoch=3)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    calls = {"n": 0}

    def stop_after_two_samples():
        calls["n"] += 1
        return calls["n"] > 2

    saved, logs = [], []
    p0 = jax.tree_util.tree_leaves(
        state.variables["posenet"]["params"])[0].copy()
    state = tr.fit(state, tiny_ds, tiny_ds, jax.random.key(5), epochs=3,
                   log_fn=logs.append,
                   save_last_fn=lambda s: saved.append(s.epoch),
                   stop_fn=stop_after_two_samples)
    # interrupted inside epoch 1 -> counter rolled back, 'last' saved once
    assert state.epoch == 0
    assert saved == [0]
    assert any("interrupt" in m for m in logs)
    # the two completed per-sample grads were accumulated into one applied
    # optimizer step (batch_size=2) before the stop fired
    p1 = jax.tree_util.tree_leaves(state.variables["posenet"]["params"])[0]
    assert not jax.numpy.allclose(p0, p1)


def test_fit_with_real_signal_stops_between_epochs(tiny_ds):
    cfg = _tiny_config(nepoch=5)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    logs = []
    with GracefulInterrupt() as stop:
        # latch the signal before fit: epoch 1 runs zero samples and fit
        # returns on the mid-epoch path without touching params
        os.kill(os.getpid(), signal.SIGTERM)
        state = tr.fit(state, tiny_ds, tiny_ds, jax.random.key(5), epochs=5,
                       log_fn=logs.append, stop_fn=stop)
    assert state.epoch == 0
    assert any("interrupt" in m for m in logs)


def test_batch_trainer_fit_stops_at_batch_boundary():
    # shapes mirror tests/test_parallel.py's single-device BatchTrainer
    # cases so the compiled step is shared via the CPU compile cache
    from plr2_tpu.train import BatchTrainer

    cfg = PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=64, num_objects=2,
                              num_mesh_points=64, sym_list=(1,),
                              crop_size=48),
        model=ModelConfig(num_points=64, num_objects=2),
        train=TrainConfig(batch_size=2, nepoch=3),
    )
    ds = SyntheticPoseDataset(num_frames=2, num_objects=2, model_points=64,
                              num_points=64, seed=7)
    tr = BatchTrainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=48)
    calls = {"n": 0}

    def stop_after_one_batch():
        calls["n"] += 1
        return calls["n"] > 1

    saved, logs = [], []
    state = tr.fit(state, ds, ds, jax.random.key(1), epochs=3,
                   log_fn=logs.append,
                   save_last_fn=lambda s: saved.append(s.epoch),
                   stop_fn=stop_after_one_batch)
    assert state.epoch == 0
    assert saved == [0]
    assert any("interrupt" in m for m in logs)


def test_fit_completes_normally_when_never_signalled(tiny_ds):
    cfg = _tiny_config(nepoch=1)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    with GracefulInterrupt() as stop:
        state = tr.fit(state, tiny_ds, tiny_ds, jax.random.key(5), epochs=1,
                       log_fn=lambda m: None, stop_fn=stop)
    assert state.epoch == 1
