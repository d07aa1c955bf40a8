"""FusedTrainer — the reference-faithful curriculum at batched dispatch
cost.

Inherits everything (curriculum switches, checkpoint gating, test loop,
preemption contract) from Trainer and replaces only train_epoch's inner
loop: samples are collected into accumulation windows of exactly
`batch_size` (or `batch_size // refine_iterations` in the joint stage,
matching Trainer), stacked onto a border-list-snapped canvas, and executed
as ONE on-device program per window (train/fused_accum.py): per-sample
grads summed, batch-1 BN running stats updated sequentially, one optimizer
step — the per-sample loop's math, bit-for-bit on identical inputs
(tests/test_fused_accum.py).

Tail samples that don't fill a window at epoch end run through the
inherited per-sample path WITHOUT an optimizer step — exactly what
Trainer.train_epoch does with its leftover grads_sum (grads dropped, BN
updates and metric logging kept).

Preemption: stop_fn is checked per sample while collecting; an interrupt
discards the partial window entirely (no grads applied AND no BN updates
from its samples — strictly cleaner than the per-sample loop, whose
already-processed window samples leave BN stats behind; see
ADVICE round-2 note on trainer.py).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from plr2_tpu.config import PipelineConfig
from plr2_tpu.pipeline import DenseFusionPipeline
from plr2_tpu.train.fused_accum import make_fused_accum_step
from plr2_tpu.train.trainer import Trainer, TrainState


class FusedTrainer(Trainer):
    """Trainer with the accumulation window fused into one XLA program."""

    def __init__(self, config: PipelineConfig,
                 pipe: Optional[DenseFusionPipeline] = None):
        if pipe is None and config.model.phase_upsample:
            # Perf routing, NOT a compiler workaround anymore: the
            # round-3 space_to_batch_converter abort on phase upsample
            # inside this trainer's grad-scan is FIXED (hand-derived
            # custom_vjp in ops/phase_upconv.py — plain dgrad convs +
            # shifted-einsum wgrads; fused+phase at crop 160 compiles
            # and runs on v5e: 33.92 ms/window-8). But the batch-1 scan
            # measures FASTER on the dense upsample path (27.35
            # ms/window-8 = 292.5 samples/s, docs/PERF_NOTES.md round-4
            # entry), so — phase being an exact speed-only rewrite with
            # the identical parameter tree (tests/test_fused_accum.py
            # pins the grads) — this trainer routes to dense, the same
            # measured-dispatch convention as ops/knn.py. To override,
            # pass an explicit `pipe` with phase_upsample=True AND
            # scan_safe_phase_vjp=True (the latter selects the
            # hand-derived phase backward this trainer's grad-scan
            # needs to compile at crop >= 160).
            dtype = (jnp.bfloat16
                     if config.model.dtype in ("bfloat16", "bf16")
                     else jnp.float32)
            pipe = DenseFusionPipeline(
                num_points=config.model.num_points,
                num_objects=config.model.num_objects,
                use_pallas=config.model.use_pallas_model,
                phase_upsample=False, dtype=dtype)
        super().__init__(config, pipe)
        # one compiled step per (stage, lr, w) curriculum point; jit
        # additionally caches per canvas/mesh shape
        self._steps: Dict[Tuple, object] = {}

    def _get_step(self, state: TrainState):
        k = (state.refine_started, state.lr, state.w)
        if k not in self._steps:
            self._steps[k] = make_fused_accum_step(
                self.pipe, sym_list=self.sym_list, w=state.w, lr=state.lr,
                refine_iterations=(self.cfg.train.refine_iterations
                                   if state.refine_started else 0))
        return self._steps[k]

    def _stack_window(self, samples):
        return self._stack_eval(samples)

    def train_epoch(self, state: TrainState, dataset, key):
        cfg = self.cfg.train
        accum = max(1, cfg.batch_size // (cfg.refine_iterations
                                          if state.refine_started else 1))
        step = self._get_step(state)
        pending, pending_keys = [], []
        losses, dists = [], []
        interrupted = False
        t0 = time.time()
        for rep in range(cfg.repeat_epoch):
            if interrupted:
                break
            for s in self._sample_iter(dataset, jax.random.fold_in(key, rep),
                                       add_noise=self.cfg.dataset.add_noise,
                                       shuffle=True,
                                       seed=state.epoch * 997 + rep):
                if self._stop_fn is not None and self._stop_fn():
                    interrupted = True
                    break
                key, kd = jax.random.split(key)
                pending.append(s)
                pending_keys.append(kd)
                if len(pending) == accum:
                    window = self._stack_window(pending)
                    dkeys = jnp.stack(pending_keys)
                    state.variables, state.opt_state, m = step(
                        state.variables, state.opt_state, window, dkeys)
                    losses.extend(np.asarray(m["loss"], np.float64).tolist())
                    dists.extend(np.asarray(m["dis"], np.float64).tolist())
                    pending, pending_keys = [], []
        if not interrupted:
            # incomplete tail window: per-sample grads/BN, optimizer step
            # withheld — Trainer's leftover-grads_sum behavior
            for s, kd in zip(pending, pending_keys):
                args = (state.variables, s.img[None], s.points[None],
                        s.choose[None], s.target[None], s.model_points[None],
                        s.idx[None])
                if state.refine_started:
                    _, bs, loss, dis = self.refine_grads(
                        *args, w=state.w, iterations=cfg.refine_iterations)
                else:
                    _, bs, loss, dis = self.posenet_grads(
                        *args, w=state.w, refine=False, dropout_key=kd)
                state.variables["posenet"]["batch_stats"] = bs
                losses.append(float(loss))
                dists.append(float(dis))
        return state, {
            "train_loss": float(np.mean(losses)) if losses else 0.0,
            "train_dis": float(np.mean(dists)) if dists else 0.0,
            "seconds": time.time() - t0,
            "interrupted": interrupted,
        }

    def update_curriculum(self, state: TrainState, test_dis: float) -> TrainState:
        prev = (state.refine_started, state.lr, state.w)
        state = super().update_curriculum(state, test_dis)
        if prev != (state.refine_started, state.lr, state.w):
            self._steps.pop(prev, None)
        return state
