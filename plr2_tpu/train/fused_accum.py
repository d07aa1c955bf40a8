"""Fused gradient-accumulation window — reference-faithful Trainer
semantics at one-XLA-dispatch-per-window cost.

The reference accumulates per-sample gradients (`loss.backward()` per
sample, `opt.step()` every `batch_size` samples — upstream tools/train.py
[upstream, mount empty]); the faithful transcription in train/trainer.py
dispatches >=2 device programs per SAMPLE, which is relay-latency-bound in
this environment (30-60 ms per dispatch; docs/PERF_NOTES.md). This module
compiles the whole accumulation window into ONE program:

  * `jax.lax.scan` over the window's `batch_size` samples,
  * per-sample gradients SUMMED in the scan carry (same order, same
    floating-point addition sequence as the host loop),
  * batch-1 BatchNorm running stats threaded through the carry and
    updated sequentially sample-by-sample (each sample's forward sees the
    stats exactly as the per-sample loop would have left them),
  * per-sample dropout keys passed in as a stacked key array so the RNG
    stream matches the host loop's `jax.random.split` sequence,
  * one optimizer update at the end of the scan.

This is NOT the BatchTrainer deviation (grad MEAN per step, real batch
BN — train/batch_trainer.py:10-16); it is the per-sample curriculum math.
tests/test_fused_accum.py pins it against N iterations of
Trainer.posenet_grads / Trainer.refine_grads on identical inputs at ULP
tolerance (rtol 3e-6): the two are separately compiled HLO programs, so
XLA may reassociate float ops (measured max 2.2e-7 relative); every
semantic choice — order, summation sequence, BN threading, RNG stream —
is identical.

The one fidelity caveat is shared with every batched mode: samples in a
window are stacked onto a common border-list canvas (data/loader.py
stack_samples), so crops smaller than the canvas see zero padding the
per-sample variable-shape path does not. Window assembly lives in
train/fused_trainer.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from plr2_tpu.losses.add_loss import pose_loss
from plr2_tpu.losses.refine_loss import refine_loss
from plr2_tpu.pipeline import DenseFusionPipeline


def make_fused_window_grads(pipe: DenseFusionPipeline,
                            sym_list: Tuple[int, ...], w: float,
                            refine_iterations: int = 0):
    """The scan body of the fused window WITHOUT the optimizer update:
    `grads(variables, window, dropout_keys) -> (grads_sum, batch_stats,
    losses, dists)`. Exposed separately so tests can pin the accumulation
    semantics (grad sum, sequential BN) directly against the per-sample
    loop, before Adam's eps-regularized update amplifies ULP noise on
    near-zero summed gradients."""
    refine_stage = refine_iterations > 0
    tree_add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)

    def _posenet_grads(variables, window, dropout_keys):
        pn = variables["posenet"]
        params = pn["params"]

        def per_sample(carry, xs):
            batch_stats, grads_sum = carry
            s, dkey = xs

            def loss_fn(p):
                (pred_r, pred_t, pred_c, _), mutated = pipe.posenet.apply(
                    {"params": p, "batch_stats": batch_stats},
                    s["img"][None], s["points"][None], s["choose"][None],
                    s["idx"][None], train=True, mutable=["batch_stats"],
                    rngs={"dropout": dkey})
                out = pose_loss(pred_r, pred_t, pred_c, s["target"][None],
                                s["model_points"][None], s["idx"][None],
                                s["points"][None], w=w, refine=False,
                                sym_list=sym_list)
                return out.loss, (mutated["batch_stats"], jnp.mean(out.dis))

            (loss, (bs, dis)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return (bs, tree_add(grads_sum, grads)), (loss, dis)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (bs, grads_sum), (losses, dists) = jax.lax.scan(
            per_sample, (pn["batch_stats"], zeros), (window, dropout_keys))
        return grads_sum, bs, losses, dists

    def _refine_grads(variables, window, dropout_keys):
        del dropout_keys  # eval-mode PoseNet, no dropout in the refiner
        pn = variables["posenet"]
        rf_params = variables["refiner"]["params"]

        def per_sample(grads_sum, xs):
            s = xs
            pred_r, pred_t, pred_c, emb = pipe.posenet.apply(
                {"params": pn["params"], "batch_stats": pn["batch_stats"]},
                s["img"][None], s["points"][None], s["choose"][None],
                s["idx"][None])
            first = pose_loss(pred_r, pred_t, pred_c, s["target"][None],
                              s["model_points"][None], s["idx"][None],
                              s["points"][None], w=w, refine=True,
                              sym_list=sym_list)

            def loss_fn(rp):
                def body(carry, _):
                    new_points, new_target, acc = carry
                    dr, dt = pipe.refiner.apply(
                        {"params": rp}, new_points,
                        jax.lax.stop_gradient(emb), s["idx"][None])
                    out = refine_loss(dr, dt, new_target,
                                      s["model_points"][None], s["idx"][None],
                                      new_points, sym_list=sym_list)
                    return (out.new_points, out.new_target,
                            acc + jnp.mean(out.dis)), jnp.mean(out.dis)

                (_, _, total), per_iter = jax.lax.scan(
                    body, (first.new_points, first.new_target, 0.0), None,
                    length=refine_iterations)
                return total, per_iter[-1]

            (total, last_dis), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(rf_params)
            return tree_add(grads_sum, grads), (total, last_dis)

        zeros = jax.tree_util.tree_map(jnp.zeros_like, rf_params)
        grads_sum, (losses, dists) = jax.lax.scan(per_sample, zeros, window)
        return grads_sum, pn["batch_stats"], losses, dists

    return _refine_grads if refine_stage else _posenet_grads


def make_fused_accum_step(pipe: DenseFusionPipeline,
                          sym_list: Tuple[int, ...], w: float, lr: float,
                          refine_iterations: int = 0):
    """Returns a jitted `step(variables, opt_state, window, dropout_keys)
    -> (variables, opt_state, metrics)`.

    `window` is a dict(img, points, choose, target, model_points, idx)
    with leading axis = the accumulation count (the window's samples IN
    ORDER); `dropout_keys` is a (B,)-shaped typed key array, one key per
    sample. `metrics` carries the per-sample `loss` and `dis` arrays
    (shape (B,)) so the caller can log exactly what the per-sample loop
    would have logged.

    With `refine_iterations > 0` this is the joint stage: frozen PoseNet
    forward in eval mode per sample, `refine_iterations` chained refiner
    steps, grads w.r.t. refiner params only (Trainer.refine_grads
    semantics); dropout_keys are accepted but unused (eval-mode PoseNet).
    """
    tx = optax.adam(lr)
    refine_stage = refine_iterations > 0
    window_grads = make_fused_window_grads(
        pipe, sym_list, w, refine_iterations)

    def step(variables, opt_state, window, dropout_keys):
        grads_sum, bs, losses, dists = window_grads(
            variables, window, dropout_keys)
        if refine_stage:
            rf_params = variables["refiner"]["params"]
            updates, opt_state = tx.update(grads_sum, opt_state, rf_params)
            variables = {
                "posenet": variables["posenet"],
                "refiner": {"params": optax.apply_updates(rf_params,
                                                          updates)},
            }
        else:
            params = variables["posenet"]["params"]
            updates, opt_state = tx.update(grads_sum, opt_state, params)
            variables = {
                "posenet": {"params": optax.apply_updates(params, updates),
                            "batch_stats": bs},
                "refiner": variables["refiner"],
            }
        return variables, opt_state, {"loss": losses, "dis": dists}

    return jax.jit(step)
