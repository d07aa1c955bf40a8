"""Pins the fused accumulation window (train/fused_accum.py) to the
per-sample Trainer loop: same grads sum, same sequential batch-1 BN
updates, same optimizer step — on identical (stacked) inputs.

Equality is pinned at ULP level (rtol 3e-6 with magnitude-scaled atol),
not bitwise: the fused scan body and the standalone posenet_grads program
are separately compiled HLO, and XLA reassociates float ops between them
(measured max ~2e-7 relative on CPU). Post-Adam params get a looser
documented bound because near-zero summed gradients sit in Adam's
eps-regularized region, where the update function's derivative amplifies
ULP noise (measured max ~9e-6 abs = 0.09*lr on a handful of elements);
the tight pins on grads_sum / batch_stats / optimizer moments carry the
semantics guarantee. This is the exact-semantics contract that lets
FusedTrainer replace the dispatch-bound per-sample loop (VERDICT round-2
next-steps #1), as opposed to BatchTrainer's deliberate mean-grad/batch-BN
deviation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from plr2_tpu.config import (
    DatasetConfig, ModelConfig, PipelineConfig, TrainConfig)
from plr2_tpu.data import SyntheticPoseDataset
from plr2_tpu.data.loader import iterate_samples
from plr2_tpu.train import FusedTrainer, Trainer
from plr2_tpu.train.fused_accum import (
    make_fused_accum_step, make_fused_window_grads)

LR = 1e-4


def _tiny_config(**train_kw):
    train_kw.setdefault("batch_size", 2)
    train_kw.setdefault("refine_iterations", 2)
    return PipelineConfig(
        dataset=DatasetConfig(name="synthetic", num_points=96, num_objects=4,
                              num_mesh_points=128, sym_list=(1,),
                              add_noise=True),
        model=ModelConfig(num_points=96, num_objects=4),
        train=TrainConfig(**train_kw),
    )


@pytest.fixture(scope="module")
def tiny_ds():
    return SyntheticPoseDataset(num_frames=2, num_objects=2,
                                model_points=128, num_points=96, seed=1)


def _window_from(ds, trainer, n, key):
    samples = []
    for s in iterate_samples(ds, key, trainer.cfg.model.num_points,
                             add_noise=False, shuffle=False, seed=0):
        samples.append(s)
        if len(samples) == n:
            break
    return trainer._stack_window(samples)


def _slice(window, i):
    return {k: v[i:i + 1] for k, v in window.items()}


# rtol covers same-magnitude elements; the atol is scaled to each leaf's
# magnitude because summed gradients cancel (terms ~1e-2 adding to ~1e-5),
# so reassociation error is ULPs of the ADDENDS, not of the sum — and a
# deep conv backward accumulates ~30 ULPs of it (measured max 3.5e-5 of
# leaf max on grads). A real semantics break (mean instead of sum = 0.67x
# on every element, broken BN threading) moves whole leaves ~2000x more.
_RTOL = 3e-6
_ATOL_SCALE = 3e-4


def _assert_tree_close(a, b, what, atol=None):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{what}: tree structure differs"
    for xa, xb in zip(la, lb):
        xb64 = np.asarray(xb, np.float64)
        scale = float(np.max(np.abs(xb64))) if xb64.size else 0.0
        np.testing.assert_allclose(
            np.asarray(xa, np.float64), xb64, rtol=_RTOL,
            atol=atol if atol is not None else max(_ATOL_SCALE * scale,
                                                   1e-12),
            err_msg=what)


def test_fused_posenet_window_matches_per_sample_loop(tiny_ds):
    cfg = _tiny_config()
    tr = FusedTrainer(cfg)
    state = tr.init_state(jax.random.key(0), crop_hw=80)
    n = 3
    window = _window_from(tiny_ds, tr, n, jax.random.key(7))
    dkeys = jax.random.split(jax.random.key(11), n)

    # --- reference: the current per-sample loop (Trainer.posenet_grads,
    # sequential BN threading, summed grads, one optax update) ---
    ref_vars = jax.tree_util.tree_map(jnp.copy, state.variables)
    tx = optax.adam(LR)
    ref_opt = tx.init(ref_vars["posenet"]["params"])
    grads_sum = None
    ref_losses, ref_dists = [], []
    for i in range(n):
        s = _slice(window, i)
        grads, bs, loss, dis = tr.posenet_grads(
            ref_vars, s["img"], s["points"], s["choose"], s["target"],
            s["model_points"], s["idx"], w=cfg.train.w, refine=False,
            dropout_key=dkeys[i])
        ref_vars["posenet"]["batch_stats"] = bs
        grads_sum = grads if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, grads)
        ref_losses.append(float(loss))
        ref_dists.append(float(dis))
    params = ref_vars["posenet"]["params"]
    updates, ref_opt = tx.update(grads_sum, ref_opt, params)
    ref_vars["posenet"]["params"] = optax.apply_updates(params, updates)

    # --- fused window grads: tight pin on the accumulation semantics ---
    wg = jax.jit(make_fused_window_grads(
        tr.pipe, sym_list=tr.sym_list, w=cfg.train.w, refine_iterations=0))
    fg, fbs, flosses, fdists = wg(state.variables, window, dkeys)
    _assert_tree_close(fg, grads_sum, "grads_sum")
    _assert_tree_close(fbs, ref_vars["posenet"]["batch_stats"],
                       "batch_stats")
    np.testing.assert_allclose(np.asarray(flosses, np.float64), ref_losses,
                               rtol=_RTOL, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fdists, np.float64), ref_dists,
                               rtol=_RTOL, atol=1e-9)

    # --- full fused step: optimizer moments tight, params at the
    # documented Adam-eps bound (0.5*lr; benign max measured 0.09*lr) ---
    step = make_fused_accum_step(tr.pipe, sym_list=tr.sym_list,
                                 w=cfg.train.w, lr=LR,
                                 refine_iterations=0)
    fus_opt = tx.init(state.variables["posenet"]["params"])
    fus_vars, fus_opt, m = step(state.variables, fus_opt, window, dkeys)
    _assert_tree_close(fus_opt, ref_opt, "opt_state")
    _assert_tree_close(fus_vars["posenet"]["params"],
                       ref_vars["posenet"]["params"], "params",
                       atol=0.5 * LR)
    _assert_tree_close(fus_vars["posenet"]["batch_stats"],
                       ref_vars["posenet"]["batch_stats"], "batch_stats")
    np.testing.assert_allclose(np.asarray(m["loss"], np.float64), ref_losses,
                               rtol=_RTOL, atol=1e-9)


def test_fused_window_phase_upsample_matches_dense(tiny_ds):
    """The fused grad-scan with phase_upsample=True (custom-VJP phase
    upconv, ops/phase_upconv.py) produces the dense-upsample pipeline's
    gradients on the identical parameter tree: the phase rewrite is
    speed-only, and its hand-derived backward (plain dgrad convs +
    shifted-einsum wgrads — the form that dodges the remote compiler's
    space_to_batch_converter abort) is a true transpose. Guards the
    removal of FusedTrainer's phase_upsample=False gate (VERDICT
    round-3 missing #4)."""
    import dataclasses

    from plr2_tpu.pipeline import DenseFusionPipeline

    cfg = _tiny_config()
    cfg_d = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, phase_upsample=False))
    tr_d = FusedTrainer(cfg_d)
    # the explicit-pipe override documented in FusedTrainer.__init__
    # (default config routes to dense — a measured perf choice, no longer
    # a compiler exclusion)
    tr_p = FusedTrainer(cfg, pipe=DenseFusionPipeline(
        num_points=cfg.model.num_points, num_objects=cfg.model.num_objects,
        phase_upsample=True, scan_safe_phase_vjp=True))
    assert tr_p.pipe.posenet.phase_upsample
    assert tr_p.pipe.posenet.scan_safe_phase_vjp

    state = tr_d.init_state(jax.random.key(0), crop_hw=80)
    n = 2
    window = _window_from(tiny_ds, tr_d, n, jax.random.key(7))
    dkeys = jax.random.split(jax.random.key(11), n)

    outs = {}
    for name, tr in (("dense", tr_d), ("phase", tr_p)):
        wg = jax.jit(make_fused_window_grads(
            tr.pipe, sym_list=tr.sym_list, w=cfg.train.w,
            refine_iterations=0))
        outs[name] = wg(state.variables, window, dkeys)
    gd, bsd, ld, dd = outs["dense"]
    gp, bsp, lp, dp = outs["phase"]
    # phase vs dense are different HLO programs for the same math: the
    # per-leaf bound matches test_models' phase-grad comparison scale
    for xa, xb in zip(jax.tree_util.tree_leaves(gp),
                      jax.tree_util.tree_leaves(gd)):
        xb64 = np.asarray(xb, np.float64)
        scale = float(np.max(np.abs(xb64))) if xb64.size else 0.0
        np.testing.assert_allclose(np.asarray(xa, np.float64), xb64,
                                   rtol=1e-4, atol=max(1e-3 * scale, 1e-9),
                                   err_msg="phase-vs-dense fused grads")
    _assert_tree_close(bsp, bsd, "phase-vs-dense batch_stats", atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp, np.float64),
                               np.asarray(ld, np.float64), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dp, np.float64),
                               np.asarray(dd, np.float64), rtol=1e-4,
                               atol=1e-7)


def test_fused_refine_window_matches_per_sample_loop(tiny_ds):
    cfg = _tiny_config()
    tr = FusedTrainer(cfg)
    state = tr.init_state(jax.random.key(2), crop_hw=80)
    n = 2
    iters = cfg.train.refine_iterations
    window = _window_from(tiny_ds, tr, n, jax.random.key(8))
    dkeys = jax.random.split(jax.random.key(12), n)

    ref_vars = jax.tree_util.tree_map(jnp.copy, state.variables)
    tx = optax.adam(LR)
    ref_opt = tx.init(ref_vars["refiner"]["params"])
    grads_sum = None
    ref_losses = []
    for i in range(n):
        s = _slice(window, i)
        grads, _, loss, dis = tr.refine_grads(
            ref_vars, s["img"], s["points"], s["choose"], s["target"],
            s["model_points"], s["idx"], w=cfg.train.w, iterations=iters)
        grads_sum = grads if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, grads)
        ref_losses.append(float(loss))
    params = ref_vars["refiner"]["params"]
    updates, ref_opt = tx.update(grads_sum, ref_opt, params)
    ref_vars["refiner"]["params"] = optax.apply_updates(params, updates)

    wg = jax.jit(make_fused_window_grads(
        tr.pipe, sym_list=tr.sym_list, w=cfg.train.w,
        refine_iterations=iters))
    fg, _, flosses, _ = wg(state.variables, window, dkeys)
    _assert_tree_close(fg, grads_sum, "refiner grads_sum")
    np.testing.assert_allclose(np.asarray(flosses, np.float64), ref_losses,
                               rtol=_RTOL, atol=1e-9)

    step = make_fused_accum_step(tr.pipe, sym_list=tr.sym_list,
                                 w=cfg.train.w, lr=LR,
                                 refine_iterations=iters)
    fus_opt = tx.init(state.variables["refiner"]["params"])
    fus_vars, fus_opt, m = step(state.variables, fus_opt, window, dkeys)
    _assert_tree_close(fus_opt, ref_opt, "opt_state")
    _assert_tree_close(fus_vars["refiner"]["params"],
                       ref_vars["refiner"]["params"], "refiner params",
                       atol=0.5 * LR)
    # PoseNet untouched in the joint stage: exact
    la = jax.tree_util.tree_leaves(fus_vars["posenet"])
    lb = jax.tree_util.tree_leaves(state.variables["posenet"])
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_fused_trainer_epoch_matches_manual_window_loop(tiny_ds):
    """A whole FusedTrainer epoch == the per-sample loop run over the same
    stacked windows (window assembly, RNG sequence, tail handling)."""
    cfg = _tiny_config(batch_size=3)  # 8 samples -> 2 windows + 2-sample tail
    tr = FusedTrainer(cfg)
    state = tr.init_state(jax.random.key(3), crop_hw=80)
    state0 = jax.tree_util.tree_map(jnp.copy, state.variables)
    opt0 = state.opt_state

    state, info = tr.train_epoch(state, tiny_ds, jax.random.key(5))
    assert not info["interrupted"]

    # --- manual mirror: same sample stream, same keys, per-sample math ---
    ref = FusedTrainer(cfg)  # fresh instance for a pristine jit cache
    rvars = state0
    tx = optax.adam(cfg.train.lr)
    ropt = opt0
    key = jax.random.key(5)
    pending, pkeys = [], []
    accum = cfg.train.batch_size
    for rep in range(cfg.train.repeat_epoch):
        for s in ref._sample_iter(tiny_ds, jax.random.fold_in(key, rep),
                                  add_noise=cfg.dataset.add_noise,
                                  shuffle=True, seed=state.epoch * 997 + rep):
            key, kd = jax.random.split(key)
            pending.append(s)
            pkeys.append(kd)
            if len(pending) == accum:
                window = ref._stack_window(pending)
                grads_sum = None
                for i in range(accum):
                    sl = _slice(window, i)
                    grads, bs, _, _ = ref.posenet_grads(
                        rvars, sl["img"], sl["points"], sl["choose"],
                        sl["target"], sl["model_points"], sl["idx"],
                        w=cfg.train.w, refine=False, dropout_key=pkeys[i])
                    rvars["posenet"]["batch_stats"] = bs
                    grads_sum = (grads if grads_sum is None else
                                 jax.tree_util.tree_map(jnp.add, grads_sum,
                                                        grads))
                params = rvars["posenet"]["params"]
                updates, ropt = tx.update(grads_sum, ropt, params)
                rvars["posenet"]["params"] = optax.apply_updates(
                    params, updates)
                pending, pkeys = [], []
    for s, kd in zip(pending, pkeys):  # tail: BN + logging, no opt step
        _, bs, _, _ = ref.posenet_grads(
            rvars, s.img[None], s.points[None], s.choose[None],
            s.target[None], s.model_points[None], s.idx[None],
            w=cfg.train.w, refine=False, dropout_key=kd)
        rvars["posenet"]["batch_stats"] = bs

    # Two windows of Adam-eps amplification chain through the second
    # window's forward (measured: one element at 1.7*lr), so these
    # epoch-level bounds are looser than the step-level pins above — their
    # job is catching window-ASSEMBLY divergence (wrong sample order /
    # dropout keys / tail handling), which changes the actual data and
    # moves whole leaves by orders of magnitude.
    _assert_tree_close(state.variables["posenet"]["params"],
                       rvars["posenet"]["params"], "params after epoch",
                       atol=3.0 * cfg.train.lr)
    _assert_tree_close(state.variables["posenet"]["batch_stats"],
                       rvars["posenet"]["batch_stats"],
                       "batch_stats after epoch", atol=3e-4)
    _assert_tree_close(state.opt_state, ropt, "opt_state after epoch",
                       atol=3e-4)


def test_fused_trainer_fit_smoke(tiny_ds):
    cfg = _tiny_config(batch_size=2, nepoch=1)
    tr = FusedTrainer(cfg)
    state = tr.init_state(jax.random.key(4), crop_hw=80)
    before = jax.tree_util.tree_leaves(
        state.variables["posenet"]["params"])[0].copy()
    logs = []
    state = tr.fit(state, tiny_ds, tiny_ds, jax.random.key(6), epochs=1,
                   log_fn=logs.append)
    after = jax.tree_util.tree_leaves(state.variables["posenet"]["params"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert state.epoch == 1 and len(logs) == 1
    assert np.isfinite(state.best_test)
