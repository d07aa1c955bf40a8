"""Point-axis (sequence) parallelism over a `points` mesh axis.

The model's "sequence" is the sampled point cloud (SURVEY.md section 2,
parallelism table): there is no attention, per-point compute is pointwise
1x1-conv matmuls, and the only cross-point operations are the global
mean-pool in the fusion trunks and the O(N*M*M2) ADD-S chamfer match.
Both shard cleanly over a mesh axis:

* `sp_chamfer` shards the TARGET cloud: each device computes the argmin
  match against its contiguous block of target points, then two pmins
  (min distance, winner-shard tie-break) + a psum of the winning shard's
  matched coordinates select the global nearest neighbour (three tiny
  invariant collectives, no gather). The matched coordinates come out bitwise
  equal to `ops.knn.chamfer_min_distance`'s (first-win argmin over
  contiguous blocks reproduces the global first-argmin tie-break), with
  the same gather-through-argmin gradient; the final norm agrees to one
  float32 ulp (program-fusion-dependent FMA rounding — measured
  bitwise-equal matched coords, <=1-ulp distances on the 8-device CPU
  mesh). This is the scale-out path when target meshes outgrow one
  chip's HBM or compute (the dense d2 matrix is H*M x M2).

* `make_sp_inference_step` / `make_sp_train_step` shard the SAMPLED
  cloud (and `choose`): inference runs the per-point trunk, heads, and
  refinement on 1/K of the points per device; training (both the stage-1
  and the joint refine stage) additionally shards the per-hypothesis
  loss terms and their gradients — the joint stage's re-centre handoff
  selects the cross-shard best hypothesis with the same invariant
  collectives as inference, under stop_gradient (the reference's
  .detach() boundary). The global pools become pmeans
  (`models.posenet._global_point_mean`) and the best-confidence
  hypothesis selection is a cross-shard argmax. The crop image and CNN
  stay replicated — the CNN has no point axis. This is the
  sequence-parallel recipe if the point count is ever scaled far past
  the reference's 500/1000.

The reference has no counterpart (single-GPU; upstream lib/loss.py
computes the chamfer dense on one device [upstream, mount empty]).
tests/test_point_parallel.py pins exactness/equality on an 8-device CPU
mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from plr2_tpu.ops.knn import nn_match_cm, safe_norm


def _pad_wrap(target: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pad the target cloud to a multiple of k by repeating its first row.

    Duplicates cannot change any min distance, and because the copies sit
    at the highest global indices the first-argmin tie-break still selects
    the original row — matched coordinates stay bitwise identical."""
    pad = (-target.shape[0]) % k
    if pad == 0:
        return target
    return jnp.concatenate(
        [target, jnp.broadcast_to(target[:1], (pad,) + target.shape[1:])], 0)


def sp_chamfer(mesh: Mesh, pred: jnp.ndarray, target: jnp.ndarray,
               axis: str = "points") -> jnp.ndarray:
    """(H, M, 3), (M2, 3) -> (H, M) nearest-target distances, with the
    target cloud sharded over `axis`.

    Same value and gradient as `ops.knn.chamfer_min_distance` (to one
    float32 ulp — see module docstring): the distance is the norm of the
    difference to the matched coordinates (held constant through the
    argmin, `safe_norm` zero-at-zero convention)."""
    k = mesh.shape[axis]
    h, m, _ = pred.shape
    target = _pad_wrap(target, k)

    def match(pred_in, t_shard):
        # pred_in: (H, M, 3) replicated; t_shard: (M2/K, 3) this shard.
        # The local match is ops/knn.py's `nn_match_cm` — the SAME
        # implementation the dense path runs (chunked over queries,
        # coordinate-major), so per-element d2/argmin math is bitwise
        # identical across the two paths by construction.
        p_cm = jnp.moveaxis(pred_in, -1, 0).reshape(3, h * m)
        matched_cm, dmin = nn_match_cm(p_cm, t_shard)
        # cross-shard selection with invariant collectives (min value is
        # a SELECTION — bitwise the global min); lowest shard index wins
        # ties, which over contiguous blocks == the global first-argmin
        gmin = jax.lax.pmin(dmin, axis)                       # (P,)
        mine = jnp.where(dmin == gmin, jax.lax.axis_index(axis), k)
        winner = jax.lax.pmin(mine, axis)                     # (P,)
        keep = (winner == jax.lax.axis_index(axis))[None, :]  # (1, P)
        return jax.lax.psum(jnp.where(keep, matched_cm, 0.0), axis)

    # the match is a piecewise-constant selection: cut autodiff at its
    # inputs (pmin/psum-selection have no/irrelevant diff rules); the
    # gradient flows through the difference below, exactly the reference
    # KNN-gather backward (ops/knn.py `nn_distance_xla`)
    matched_cm = jax.shard_map(
        match, mesh=mesh, in_specs=(P(), P(axis, None)), out_specs=P(),
    )(jax.lax.stop_gradient(pred), jax.lax.stop_gradient(target))
    p_cm = jnp.moveaxis(pred, -1, 0).reshape(3, h * m)
    diff_cm = p_cm - matched_cm
    return safe_norm(diff_cm, axis=0).reshape(h, m)


def make_sp_inference_step(pipe, mesh: Mesh, refine_iterations: int = 2,
                           axis: str = "points"):
    """Pose estimation with the sampled cloud sharded over `axis`.

    Returns step(variables, img, cloud, choose, obj) -> PoseEstimate with
    the same semantics as `pipe.estimate`: cloud/choose (B, N, ...) are
    split into contiguous N/K blocks per device, img/params replicated;
    the trunk pools pmean across shards and the best-confidence initial
    hypothesis is a cross-shard argmax (first-win, matching the global
    argmax tie-break). N must divide by the axis size."""
    from plr2_tpu.geometry.quaternion import normalize_quaternion
    from plr2_tpu.pipeline import PoseEstimate
    from plr2_tpu.refine.iterative import iterative_refine

    sp_posenet = pipe.posenet.clone(points_axis=axis)
    sp_refiner = pipe.refiner.clone(points_axis=axis)
    k = mesh.shape[axis]

    def check_shapes(cloud):
        if cloud.shape[1] % k:
            raise ValueError(
                f"sequence parallelism needs the point count to divide by "
                f"the '{axis}' axis size: N={cloud.shape[1]}, K={k}")

    def local_step(variables, img, cloud, choose, obj):
        pred_r, pred_t, pred_c, emb = sp_posenet.apply(
            variables["posenet"], img, cloud, choose, obj)
        conf = pred_c[..., 0]                                  # (B, n_local)
        which = jnp.argmax(conf, axis=-1)                      # (B,)
        take = lambda arr: jnp.take_along_axis(  # noqa: E731
            arr, which[:, None, None], axis=1)[:, 0]
        cand_c = jnp.take_along_axis(conf, which[:, None], axis=1)[:, 0]
        cand_q = normalize_quaternion(take(pred_r))
        cand_t = take(cloud) + take(pred_t)
        # cross-shard best hypothesis: pmax of the local winners; the
        # lowest shard index wins ties, which over contiguous blocks ==
        # the global first argmax. Invariant collectives only (vma-clean).
        gmax = jax.lax.pmax(cand_c, axis)                      # (B,)
        mine = jnp.where(cand_c == gmax, jax.lax.axis_index(axis), k)
        keep = (jax.lax.pmin(mine, axis) ==
                jax.lax.axis_index(axis))[:, None]             # (B, 1)
        q0 = jax.lax.psum(jnp.where(keep, cand_q, 0.0), axis)
        t0 = jax.lax.psum(jnp.where(keep, cand_t, 0.0), axis)

        def refiner_fn(new_cloud, emb_, obj_):
            return sp_refiner.apply(variables["refiner"], new_cloud, emb_,
                                    obj_)

        q, t = iterative_refine(refiner_fn, cloud, emb, obj, q0, t0,
                                refine_iterations)
        return PoseEstimate(quat=q, trans=t, confidence=gmax)

    sharded = P(None, axis)
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), sharded, sharded, P()),
        out_specs=PoseEstimate(quat=P(), trans=P(), confidence=P()),
    )

    def step(variables, img, cloud, choose, obj):
        check_shapes(cloud)  # trace-time: clear error before shard_map's
        return mapped(variables, img, cloud, choose, obj)

    return jax.jit(step)


def make_sp_train_step(pipe, mesh: Mesh, sym_list, w: float, lr: float,
                       axis: str = "points", sym_slots: int | None = None,
                       refine_iterations: int = 0,
                       data_axis: str | None = None):
    """Training step with the sampled cloud sharded over `axis`.

    Mirrors `parallel.data_parallel.make_train_step` with sequence
    parallelism instead of batch sharding: every device holds the full
    batch but only N/K of the sampled points — per-point hypotheses,
    their losses, and their gradients shard 1/K; the loss is a mean over
    (B, N) so the global value is the pmean of equal-sized local means,
    and the reported best-confidence distance uses the cross-shard
    argmax. BN/dropout live in the CNN, which runs on the replicated
    crop — identical stats on every shard by construction.

    With `refine_iterations > 0` this is the JOINT stage (frozen
    eval-mode PoseNet, grads into the refiner only). The re-centred
    new_points/new_target handoff needs the cross-shard best-confidence
    hypothesis INSIDE the differentiated loss; it is selected with the
    same invariant pmax/pmin/psum recipe as `make_sp_inference_step` —
    under `stop_gradient`, exactly where the reference `.detach()`es the
    handoff (upstream lib/loss.py [upstream, mount empty]), so no
    gradient ever flows through the selection collectives. Each
    iteration's refiner pool pmeans across shards; the per-iteration
    distances are computed from replicated (delta-pose, target) tensors
    and come out identical on every shard.

    With `data_axis`, the batch dimension is ADDITIONALLY sharded over
    that mesh axis — the composed (data, points) recipe. The shard_map
    goes manual over {data_axis, axis} only; any OTHER mesh axis (e.g.
    `model`) stays auto, so tensor-parallel committed weight shardings
    (parallel/tensor_parallel.py) propagate through the body via GSPMD —
    one program over a 3-D (data, model, points) mesh. Semantics under
    data sharding:

    * train-mode BN moments sync over `data_axis` (flax `axis_name`,
      threaded as `bn_axis` through the CNN stack) — bitwise the global
      moments a single-device batch computes, up to reduction order;
    * dropout draws per-data-shard masks from
      `fold_in(dropout_key, shard_index)` — a DEFINED semantics, pinned
      by comparing mesh layouts with the SAME data-axis size (tp/sp
      machinery varies, masks stay fixed; tests/test_composed_mesh.py).
      It is not bit-identical to the single-device global mask, exactly
      as two dropout seeds are not — the joint refine stage (no dropout,
      eval-mode BN) IS pinned exactly against the single-device step;
    * the loss/gradients pmean over points then data.

    Returns (init_opt_state, train_step) with make_train_step's
    signature: (variables, opt_state, batch, dropout_key) ->
    (variables, opt_state, {loss, dis}).
    """
    import optax

    from plr2_tpu.geometry.quaternion import (normalize_quaternion,
                                              quat_to_matrix_df)
    from plr2_tpu.losses.add_loss import pose_loss
    from plr2_tpu.losses.refine_loss import refine_loss
    from plr2_tpu.parallel.data_parallel import adam_update

    tx = optax.adam(lr)
    # bn_axis only matters for train-mode BN (stage 1); the joint stage
    # runs the CNN frozen in eval mode (running stats, no sync needed)
    sp_posenet = pipe.posenet.clone(points_axis=axis, bn_axis=data_axis)
    sp_refiner = pipe.refiner.clone(points_axis=axis)
    k = mesh.shape[axis]
    kd = mesh.shape[data_axis] if data_axis else 1
    refine_stage = refine_iterations > 0

    def init_opt_state(variables):
        target = "refiner" if refine_stage else "posenet"
        return tx.init(variables[target]["params"])

    def local_loss(params, batch_stats, batch, dropout_key):
        if data_axis is not None:
            # per-data-shard dropout mask (defined semantics, docstring)
            dropout_key = jax.random.fold_in(
                dropout_key, jax.lax.axis_index(data_axis))
        (pred_r, pred_t, pred_c, _), mutated = sp_posenet.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["img"], batch["points"], batch["choose"], batch["idx"],
            train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        out = pose_loss(pred_r, pred_t, pred_c, batch["target"],
                        batch["model_points"], batch["idx"], batch["points"],
                        w=w, refine=False, sym_list=tuple(sym_list),
                        max_sym_slots=sym_slots)
        loss = jax.lax.pmean(out.loss, axis)  # mean over (B, N) points
        if data_axis is not None:
            loss = jax.lax.pmean(loss, data_axis)  # then over batch shards
        # metric candidates leave the mapped fn SHARDED (the winner
        # selection happens outside — pmax/pmin collectives have no
        # autodiff rules, and even aux outputs are traced by jvp)
        cand = jnp.stack([jnp.max(pred_c[..., 0], axis=-1), out.dis])
        return loss, (mutated["batch_stats"], cand)  # cand: (2, B) local

    def local_refine_loss(rf_params, pn_variables, batch):
        # frozen PoseNet forward in eval mode (reference: estimator.eval()
        # in the joint stage); everything up to the refiner is constant
        pred_r, pred_t, pred_c, emb = sp_posenet.apply(
            pn_variables, batch["img"], batch["points"], batch["choose"],
            batch["idx"])
        pred_r, pred_t, conf = jax.lax.stop_gradient(
            (pred_r.astype(jnp.float32), pred_t.astype(jnp.float32),
             pred_c[..., 0].astype(jnp.float32)))
        points = batch["points"].astype(jnp.float32)
        target = batch["target"].astype(jnp.float32)

        # cross-shard best-confidence handoff: local first-win argmax,
        # then the make_sp_inference_step selection (pmax winner conf,
        # lowest-shard tie-break == global first argmax over contiguous
        # blocks, psum winner transfer) — all under the stop_gradient
        # above, matching pose_loss's detached new_points/new_target
        which = jnp.argmax(conf, axis=-1)                     # (B,)
        take = lambda arr: jnp.take_along_axis(  # noqa: E731
            arr, which[:, None, None], axis=1)[:, 0]
        cand_c = jnp.take_along_axis(conf, which[:, None], axis=1)[:, 0]
        cand_q = normalize_quaternion(take(pred_r))
        cand_t = take(points) + take(pred_t)
        gmax = jax.lax.pmax(cand_c, axis)
        mine = jnp.where(cand_c == gmax, jax.lax.axis_index(axis), k)
        keep = (jax.lax.pmin(mine, axis) ==
                jax.lax.axis_index(axis))[:, None]            # (B, 1)
        q0 = jax.lax.psum(jnp.where(keep, cand_q, 0.0), axis)
        t0 = jax.lax.psum(jnp.where(keep, cand_t, 0.0), axis)
        rot0 = quat_to_matrix_df(q0)                          # (B, 3, 3)
        # metric re-centring at HIGHEST (add_loss.py precision rule)
        new_points = jnp.matmul(points - t0[:, None, :], rot0,
                                precision=jax.lax.Precision.HIGHEST)
        new_target = jnp.matmul(target - t0[:, None, :], rot0,
                                precision=jax.lax.Precision.HIGHEST)

        loss = 0.0
        for _ in range(refine_iterations):
            dr, dt = sp_refiner.apply(
                {"params": rf_params}, new_points,
                jax.lax.stop_gradient(emb), batch["idx"])
            ro = refine_loss(dr, dt, new_target, batch["model_points"],
                             batch["idx"], new_points,
                             sym_list=tuple(sym_list))
            new_points, new_target = ro.new_points, ro.new_target
            loss = loss + jnp.mean(ro.dis)
        # dr/dt are replicated over the points shards (the refiner pool
        # pmeans across them), so dis and loss are points-invariant; with
        # a sharded batch they still vary per data shard — average them
        if data_axis is not None:
            loss = jax.lax.pmean(loss, data_axis)
            dis = jax.lax.pmean(jnp.mean(ro.dis), data_axis)
        else:
            dis = jnp.mean(ro.dis)
        return loss, dis

    sharded = P(data_axis, axis)
    batch_specs = {"img": P(data_axis), "points": sharded,
                   "choose": sharded, "target": P(data_axis),
                   "model_points": P(data_axis), "idx": P(data_axis)}
    # manual over the data/points axes only; other mesh axes (model)
    # stay auto so tp weight shardings propagate via GSPMD
    manual = frozenset(a for a in (data_axis, axis) if a is not None)
    # cand dim 1 concatenates points-major then data — reshape(2, k, -1)
    # recovers (points shard, global sample) in global batch order
    cand_spec = P(None, (axis,) if data_axis is None else (axis, data_axis))
    mapped = jax.shard_map(
        local_loss, mesh=mesh, axis_names=manual,
        in_specs=(P(), P(), batch_specs, P()),
        out_specs=(P(), (P(), cand_spec)))
    mapped_refine = jax.shard_map(
        local_refine_loss, mesh=mesh, axis_names=manual,
        in_specs=(P(), P(), batch_specs), out_specs=(P(), P()))

    def train_step(variables, opt_state, batch, dropout_key):
        if batch["points"].shape[1] % k:
            raise ValueError(
                f"sequence parallelism needs the point count to divide by "
                f"the '{axis}' axis size: N={batch['points'].shape[1]}, "
                f"K={k}")
        if batch["img"].shape[0] % kd:
            raise ValueError(
                f"composed data sharding needs the batch to divide by the "
                f"'{data_axis}' axis size: B={batch['img'].shape[0]}, "
                f"K={kd}")
        pn = variables["posenet"]
        if refine_stage:
            rf_params = variables["refiner"]["params"]
            (loss, dis), grads = jax.value_and_grad(
                mapped_refine, has_aux=True)(rf_params, pn, batch)
            rf_params, opt_state = adam_update(tx, grads, opt_state,
                                               rf_params)
            variables = {"posenet": pn, "refiner": {"params": rf_params}}
            return variables, opt_state, {"loss": loss, "dis": dis}
        (loss, (bs, cand)), grads = jax.value_and_grad(
            mapped, has_aux=True)(pn["params"], pn["batch_stats"],
                                  batch, dropout_key)
        # global best-confidence distance: first-win argmax over the K
        # shard candidates == the global first argmax (contiguous blocks)
        conf, dis_k = cand.reshape(2, k, -1)              # each (K, B)
        which = jnp.argmax(conf, axis=0)                  # (B,)
        dis = jnp.mean(jnp.take_along_axis(dis_k, which[None, :], axis=0))
        params, opt_state = adam_update(tx, grads, opt_state, pn["params"])
        variables = {
            "posenet": {"params": params, "batch_stats": bs},
            "refiner": variables["refiner"],
        }
        return variables, opt_state, {"loss": loss, "dis": dis}

    return init_opt_state, jax.jit(train_step)
