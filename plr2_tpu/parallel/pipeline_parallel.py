"""Pipeline parallelism over the refinement iterations (`pipe` mesh axis).

The serving chain's only sequential dependency is the iterative refiner:
iteration i+1 consumes iteration i's pose (refine/iterative.py — on one
device a lax.scan). With K chips on a `pipe` axis, stage d runs refinement
iteration d: frame microbatches stream through the ring, each chip doing
one PoseRefineNet apply per tick and handing the composed (q, t) pose to
its neighbour over ICI (`ppermute`). The stages are homogeneous (same
weights, same computation), so — unlike a layer-split pipeline of a
heterogeneous network — no chip ever computes a stage it throws away;
the only overhead is the (K-1)-tick fill/drain bubble. Steady-state
throughput is K times one chip's, at one-iteration latency per chip.

The reference runs these iterations in host Python on one GPU (upstream
tools/eval_ycb.py refine loop [upstream, mount empty]); the in-repo
single-chip counterpart is `refine.iterative.iterative_refine`.
tests/test_pipeline_parallel.py pins equality against it on a CPU mesh.

Design notes:
* The read-only per-microbatch context (cloud, emb, obj, q0, t0) is
  replicated; each stage dynamic-slices the microbatch currently at its
  position (tick t, stage d -> microbatch t-d). Only the pose travels the
  ring. Streaming the context too would save the K-way replication at the
  cost of a (mb, N, 35)-sized ppermute per tick — at the reference's
  N=500/1000 the context is small enough that replication is the better
  trade; revisit if clouds ever outgrow HBM/K.
* Stage count = mesh axis size = refine_iterations. The last stage
  accumulates finished poses locally; one psum at the end replicates them
  (all other stages contribute zeros).
* There is deliberately NO pp training step: the joint-stage refiner
  loss backpropagates per iteration (the re-centred handoff between
  iterations is stop-gradiented — losses/refine_loss.py,
  data_parallel._refiner_loss), so a training ring would carry zero
  inter-stage gradient traffic while still needing an all-reduce of the
  shared refiner weights' grads — i.e. it degenerates to data
  parallelism over the iteration axis, plus a fill/drain bubble and
  per-tick ppermutes that plain dp does not pay. Use dp for the joint
  stage (docs/PARALLELISM.md has the full argument).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plr2_tpu.geometry.pointcloud import compose_pose, recenter_points
from plr2_tpu.geometry.quaternion import normalize_quaternion


def make_pp_refine(refiner, mesh: Mesh, num_micro: int, axis: str = "pipe",
                   iters_per_stage: int = 1, batch_axis: str | None = None):
    """Pipelined refinement: mesh.shape[axis] stages, each running
    `iters_per_stage` consecutive refinement iterations (total =
    stages * iters_per_stage — e.g. the reference's 2-iteration protocol
    on a 2-stage ring, or 4 iterations as 2 stages x 2).

    Returns fn(refiner_variables, cloud, emb, obj, q0, t0) -> (q, t) over
    stacked microbatches — cloud (num_micro, mb, N, 3), emb (num_micro,
    mb, N, E), obj (num_micro, mb), q0 (num_micro, mb, 4), t0 (num_micro,
    mb, 3) — returning (num_micro, mb, 4/3) final poses.

    With `batch_axis`, the microbatch dimension (mb) is ADDITIONALLY
    sharded over that mesh axis — a (data, pipe) composition: each data
    shard runs its own independent refinement ring over its slice of
    every microbatch; the ring collectives stay on `axis` only, so the
    data axis adds zero communication.
    """
    nstages = mesh.shape[axis]

    def pp_fn(rvars, clouds, embs, objs, q0s, t0s):
        d = jax.lax.axis_index(axis)
        mb = clouds.shape[1]
        take = lambda arr, i: jax.lax.dynamic_index_in_dim(  # noqa: E731
            arr, i, 0, keepdims=False)

        def tick(carry, t):
            q_in, t_in, qbuf, tbuf = carry
            m = t - d  # microbatch at this stage this tick
            valid = jnp.logical_and(m >= 0, m < num_micro)
            mc = jnp.clip(m, 0, num_micro - 1)
            cloud, emb, obj = take(clouds, mc), take(embs, mc), take(objs, mc)
            # stage 0 injects the fresh initial pose; later stages take
            # the streamed pose from their ring predecessor
            first = d == 0
            q2 = jnp.where(first, take(q0s, mc), q_in)
            t2 = jnp.where(first, take(t0s, mc), t_in)
            # identical arithmetic to refine.iterative.iterative_refine
            for _ in range(iters_per_stage):
                new_cloud = recenter_points(cloud, q2, t2)
                dq, dt = refiner.apply(rvars, new_cloud, emb, obj)
                dq = normalize_quaternion(dq[:, 0, :])
                q2, t2 = compose_pose(q2, t2, dq, dt[:, 0, :])
            perm = [(i, i + 1) for i in range(nstages - 1)]
            q_out = jax.lax.ppermute(q2, axis, perm)
            t_out = jax.lax.ppermute(t2, axis, perm)
            done = jnp.logical_and(d == nstages - 1, valid)
            qbuf = jnp.where(done, qbuf.at[mc].set(q2), qbuf)
            tbuf = jnp.where(done, tbuf.at[mc].set(t2), tbuf)
            return (q_out, t_out, qbuf, tbuf), None

        # initial carries are rewritten device-varyingly on every tick —
        # mark them varying up front so the scan carry type is stable
        vary_axes = (axis,) + ((batch_axis,) if batch_axis else ())
        init = jax.lax.pcast(
            (jnp.zeros((mb, 4)), jnp.zeros((mb, 3)),
             jnp.zeros((num_micro, mb, 4)), jnp.zeros((num_micro, mb, 3))),
            vary_axes, to="varying")
        ticks = jnp.arange(num_micro + nstages - 1)
        (_, _, qbuf, tbuf), _ = jax.lax.scan(tick, init, ticks)
        # only the last stage wrote finished poses; psum replicates them
        return jax.lax.psum(qbuf, axis), jax.lax.psum(tbuf, axis)

    mb_spec = P(None, batch_axis)  # ≡ P() when batch_axis is None
    manual = frozenset(a for a in (axis, batch_axis) if a is not None)
    return jax.shard_map(
        pp_fn, mesh=mesh, axis_names=manual,
        in_specs=(P(), mb_spec, mb_spec, mb_spec, mb_spec, mb_spec),
        out_specs=(mb_spec, mb_spec))


def make_pp_estimate_step(pipe, mesh: Mesh, num_micro: int,
                          axis: str = "pipe", iters_per_stage: int = 1,
                          batch_axis: str | None = None):
    """Full pose estimation with pipelined refinement.

    Returns step(variables, img, cloud, choose, obj) -> PoseEstimate with
    `pipe.estimate(..., refine_iterations=stages * iters_per_stage)`
    semantics. The PoseNet forward runs batch-sharded over the SAME chips
    (the pipe axis doubles as a data axis for the non-sequential part —
    every chip is busy in both phases), then the batch is split into
    `num_micro` microbatches that stream through the refinement ring. The
    batch size must divide by num_micro.

    With `batch_axis`, a (data, pipe) composition: the PoseNet phase
    batch-shards over BOTH axes and the ring keeps each data shard's
    slice of every microbatch local (make_pp_refine batch_axis).
    """
    from plr2_tpu.pipeline import PoseEstimate
    from plr2_tpu.refine.iterative import initial_pose

    refine = make_pp_refine(pipe.refiner, mesh, num_micro, axis,
                            iters_per_stage, batch_axis=batch_axis)

    def step(variables, img, cloud, choose, obj):
        if img.shape[0] % num_micro:
            raise ValueError(
                f"pipelined refinement needs the batch to divide into "
                f"microbatches: B={img.shape[0]}, num_micro={num_micro}")
        if batch_axis and (img.shape[0] // num_micro) % mesh.shape[batch_axis]:
            raise ValueError(
                f"composed data sharding needs the microbatch to divide by "
                f"the '{batch_axis}' axis: mb={img.shape[0] // num_micro}, "
                f"K={mesh.shape[batch_axis]}")
        pred_r, pred_t, pred_c, emb = pipe.posenet.apply(
            variables["posenet"], img, cloud, choose, obj)
        q0, t0 = initial_pose(pred_r, pred_t, pred_c, cloud)
        split = lambda x: x.reshape((num_micro, -1) + x.shape[1:])  # noqa: E731
        q, t = refine(variables["refiner"], split(cloud), split(emb),
                      split(obj), split(q0), split(t0))
        merge = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
        return PoseEstimate(quat=merge(q), trans=merge(t),
                            confidence=jnp.max(pred_c[..., 0], axis=-1))

    spec = P((batch_axis, axis)) if batch_axis else P(axis)
    data = NamedSharding(mesh, spec)
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(repl, data, data, data, data))
