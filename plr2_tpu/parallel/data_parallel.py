"""Batched, mesh-sharded training and inference steps.

`make_train_step` builds a single-XLA-program training step over a batch:
PoseNet forward (train-mode BN), confidence-weighted ADD(-S) loss, grads.
Under a mesh, inputs are sharded over the `data` axis and parameters are
replicated; XLA inserts the ICI all-reduce for the gradient mean. This is
the throughput-oriented counterpart of the reference-faithful per-sample
accumulation loop in train/trainer.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from plr2_tpu.losses.add_loss import pose_loss
from plr2_tpu.losses.refine_loss import refine_loss
from plr2_tpu.pipeline import DenseFusionPipeline


def adam_update(tx, grads, opt_state, params):
    """One optimizer step: returns (new_params, new_opt_state). Shared by
    the data-parallel and sequence-parallel trainers."""
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_train_step(pipe: DenseFusionPipeline, sym_list: Tuple[int, ...],
                    w: float, lr: float, refine_iterations: int = 0,
                    mesh=None, remat: bool = False,
                    sym_slots: int | None = None):
    """Returns (init_opt_state, train_step). train_step signature:
    (variables, opt_state, batch) -> (variables, opt_state, metrics).

    batch = dict(img, points, choose, target, model_points, idx) with a
    leading batch axis. With `mesh`, in/out shardings pin the batch to the
    `data` axis and everything else replicated. With `remat`, the PoseNet
    forward is rematerialized in the backward pass (jax.checkpoint) —
    trades ~1/3 more FLOPs for dropping the CNN activation residuals,
    enabling much larger per-chip batches. With `sym_slots=K`, mixed
    batches with at most K symmetric samples run the O(N*M*M2) ADD-S
    chamfer on K compacted slots only (exact; see pose_loss) — the right
    setting is a small multiple of batch * sym_fraction of the dataset.
    """
    tx = optax.adam(lr)
    refine_stage = refine_iterations > 0

    def init_opt_state(variables):
        # reference stage semantics: the optimizer targets PoseNet params
        # in the first stage and PoseRefineNet params in the joint stage
        target = "refiner" if refine_stage else "posenet"
        return tx.init(variables[target]["params"])

    def _forward(params, batch_stats, batch, dropout_key):
        return pipe.posenet.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["img"], batch["points"], batch["choose"], batch["idx"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})

    forward = jax.checkpoint(_forward) if remat else _forward

    def _posenet_loss(params, batch_stats, batch, dropout_key):
        (pred_r, pred_t, pred_c, _), mutated = forward(
            params, batch_stats, batch, dropout_key)
        out = pose_loss(pred_r, pred_t, pred_c, batch["target"],
                        batch["model_points"], batch["idx"], batch["points"],
                        w=w, refine=False, sym_list=sym_list,
                        max_sym_slots=sym_slots)
        return out.loss, (mutated["batch_stats"], jnp.mean(out.dis))

    def _refiner_loss(refiner_params, pn_variables, batch):
        # PoseNet frozen in eval mode (reference: estimator.eval() in the
        # joint stage); grads flow into the refiner only
        pred_r, pred_t, pred_c, emb = pipe.posenet.apply(
            pn_variables, batch["img"], batch["points"], batch["choose"],
            batch["idx"])
        out = pose_loss(pred_r, pred_t, pred_c, batch["target"],
                        batch["model_points"], batch["idx"], batch["points"],
                        w=w, refine=True, sym_list=sym_list)
        loss = 0.0
        new_points, new_target = out.new_points, out.new_target
        for _ in range(refine_iterations):
            dr, dt = pipe.refiner.apply(
                {"params": refiner_params}, new_points,
                jax.lax.stop_gradient(emb), batch["idx"])
            ro = refine_loss(dr, dt, new_target, batch["model_points"],
                             batch["idx"], new_points, sym_list=sym_list)
            new_points, new_target = ro.new_points, ro.new_target
            loss = loss + jnp.mean(ro.dis)
        return loss, jnp.mean(ro.dis)

    def train_step(variables, opt_state, batch, dropout_key):
        pn = variables["posenet"]
        if refine_stage:
            rf_params = variables["refiner"]["params"]
            (loss, dis), grads = jax.value_and_grad(
                _refiner_loss, has_aux=True)(rf_params, pn, batch)
            rf_params, opt_state = adam_update(tx, grads, opt_state, rf_params)
            variables = {"posenet": pn, "refiner": {"params": rf_params}}
        else:
            (loss, (bs, dis)), grads = jax.value_and_grad(
                _posenet_loss, has_aux=True)(pn["params"], pn["batch_stats"],
                                             batch, dropout_key)
            params, opt_state = adam_update(tx, grads, opt_state, pn["params"])
            variables = {
                "posenet": {"params": params, "batch_stats": bs},
                "refiner": variables["refiner"],
            }
        return variables, opt_state, {"loss": loss, "dis": dis}

    if mesh is None:
        return init_opt_state, jax.jit(train_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {k: data for k in
                       ("img", "points", "choose", "target", "model_points", "idx")}
    step = jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_shardings, repl),
        out_shardings=(repl, repl, repl),
    )
    return init_opt_state, step


def make_inference_step(pipe: DenseFusionPipeline, refine_iterations: int = 2,
                        mesh=None):
    """Batched pose-estimation step, batch-sharded under a mesh."""

    def infer(variables, img, points, choose, idx):
        return pipe.estimate(variables, img, points, choose, idx,
                             refine_iterations=refine_iterations)

    if mesh is None:
        return jax.jit(infer)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(infer,
                   in_shardings=(repl, data, data, data, data),
                   out_shardings=data)
