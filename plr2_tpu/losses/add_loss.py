"""Confidence-weighted ADD(-S) pose loss.

Re-implements the reference's lib/loss.py `loss_calculation` semantics
(SURVEY.md section 2 #6), vectorized over the batch (the reference operates
on batch element 0 only — at its canonical batch_size-1 DataLoader the two
are identical):

  * per-point predicted pose: R_i from normalized quaternion, candidate
    translation t_i = points_i + pred_t_i
  * ADD    : mean_j || (mp @ R_i^T + t_i)_j - target_j ||
  * ADD-S  : mean_j min_k || (mp @ R_i^T + t_i)_j - target_k ||  (symmetric
             objects; equals the reference's KNN-gather-then-norm, with the
             same subgradient)
  * loss   = mean_i ( dis_i * c_i - w * log c_i )
  * emits (new_points, new_target) re-centred by the best-confidence
    hypothesis for the refiner stage, with stop_gradient (reference
    .detach()).

The sym-object ADD-S reorder is skipped during the refine stage, matching
the `if not refine:` guard in the reference loss.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from plr2_tpu.geometry.quaternion import normalize_quaternion, quat_to_matrix_df
from plr2_tpu.ops.knn import chamfer_min_distance


class PoseLossOut(NamedTuple):
    loss: jnp.ndarray        # scalar
    dis: jnp.ndarray         # (B,) distance of the best-confidence hypothesis
    new_points: jnp.ndarray  # (B, N, 3) cloud re-centred by best pose
    new_target: jnp.ndarray  # (B, M, 3) target re-centred by best pose


def transform_hypotheses(pred_r, pred_t, points, model_points):
    """Per-point pose hypotheses applied to the mesh model points.

    pred_r (B,N,4) raw quats; pred_t (B,N,3); points (B,N,3) sampled cloud;
    model_points (B,M,3). Returns (pred (B,N,M,3), rot (B,N,3,3), t (B,N,3)).
    """
    q = normalize_quaternion(pred_r)
    rot = quat_to_matrix_df(q)  # (B, N, 3, 3)
    t = points + pred_t  # (B, N, 3) candidate translations
    # pred[b,i,j,l] = sum_k model_points[b,j,k] * rot[b,i,l,k]  (mp @ R^T)
    # HIGHEST: metric coordinates must not round through bf16 operands
    # (TPU default) — CLAUDE.md precision rule; the K=3 contraction is
    # MXU-padding-bound either way
    pred = jnp.einsum("bjk,bilk->bijl", model_points, rot,
                      precision=jax.lax.Precision.HIGHEST)
    return pred + t[:, :, None, :], rot, t


def _adds_distance(pred_b, target_b):
    """pred_b (N, M, 3), target_b (M, 3) -> (N,) symmetric distance."""
    return jnp.mean(chamfer_min_distance(pred_b, target_b), axis=-1)


def paired_add_mean(rot, t, model_points, target):
    """ADD: mean_j || rot_i @ mp_j + t_i - target_j ||  -> (B, N).

    Computes the paired distance WITHOUT materializing the (B, N, M, 3)
    hypothesis tensor: the K=3 rotate is nine broadcast FMA chains —
    exact f32 elementwise VPU ops, the same arithmetic quality as the
    HIGHEST-precision dot at K=3 — which XLA fuses with the squared-sum,
    safe-sqrt, and mean-over-j reduction into (B, N)-output kernels. The
    einsum formulation is a dot_general the fuser must materialize (192
    MB at the stage-1 training shape, plus a 43x-padding layout trap on
    the 3-trailing dim — see `compact` below); this form has no 3-dim
    tensor at all. Subgradient at exact pred/target coincidence is zero
    (safe_norm's torch.norm convention, regression-tested in
    tests/test_losses.py). Measured: stage-1 loss fwd+bwd cut in
    docs/PERF_NOTES.md round-4 entry."""
    d2 = None
    for axis in range(3):
        p = (model_points[..., None, :, 0] * rot[..., :, None, axis, 0]
             + model_points[..., None, :, 1] * rot[..., :, None, axis, 1]
             + model_points[..., None, :, 2] * rot[..., :, None, axis, 2]
             + t[..., :, None, axis] - target[..., None, :, axis])
        d2 = p * p if d2 is None else d2 + p * p
    positive = d2 > 0
    return jnp.mean(jnp.sqrt(jnp.where(positive, d2, 1.0)) * positive,
                    axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("w", "refine", "sym_list",
                     "max_sym_slots"),
)
def pose_loss(
    pred_r: jnp.ndarray,       # (B, N, 4)
    pred_t: jnp.ndarray,       # (B, N, 3)
    pred_c: jnp.ndarray,       # (B, N, 1)
    target: jnp.ndarray,       # (B, M, 3) GT-transformed model points
    model_points: jnp.ndarray, # (B, M, 3)
    idx: jnp.ndarray,          # (B,) object indices
    points: jnp.ndarray,       # (B, N, 3) sampled cloud
    w: float,
    refine: bool,
    sym_list: Tuple[int, ...],
    max_sym_slots: int | None = None,
) -> PoseLossOut:
    b, n, _ = pred_r.shape
    # metric math is ALWAYS f32 regardless of the network compute dtype
    # (bf16 model outputs under mixed-precision training): distances and
    # quaternion normalization at bf16 are far too coarse. No-op (elided
    # by XLA) for f32 callers; gradients flow back through the cast.
    pred_r, pred_t, pred_c, target, model_points, points = (
        x.astype(jnp.float32)
        for x in (pred_r, pred_t, pred_c, target, model_points, points))
    q = normalize_quaternion(pred_r)
    rot = quat_to_matrix_df(q)     # (B, N, 3, 3)
    t_cand = points + pred_t       # (B, N, 3) candidate translations
    c = pred_c[..., 0]  # (B, N)

    def make_pred():
        # (B, N, M, 3) hypothesis tensor — ONLY built inside the chamfer
        # branches that need explicit coordinates. lax.switch lifts
        # closed-over values to eagerly-computed operands, so this must
        # be called inside a branch body, never at trace top level.
        pred = jnp.einsum("bjk,bilk->bijl", model_points, rot,
                          precision=jax.lax.Precision.HIGHEST)
        return pred + t_cand[:, :, None, :]

    # ADD: paired mean distance, fused — no hypothesis materialization
    def add_all(_):
        return paired_add_mean(rot, t_cand, model_points, target)

    if not refine and len(sym_list) > 0:
        sym_arr = jnp.asarray(sym_list, dtype=idx.dtype)
        is_sym = jnp.any(idx[:, None] == sym_arr[None, :], axis=-1)  # (B,)

        def adds_all(_):
            return jax.vmap(
                _adds_distance
            )(make_pred(), target)  # (B, N)

        def mixed(_):
            return jnp.where(is_sym[:, None], adds_all(None), add_all(None))

        def compact(_):
            # mixed batch with few symmetric samples: gather them into K
            # static slots, run the O(N*M*M2) chamfer on those K only,
            # scatter back over the cheap paired ADD. Exact (same
            # per-sample math as `mixed`) whenever n_sym <= K — the case
            # select below guarantees that. The chamfer is ~M x the ADD
            # cost, so on realistic YCB batches (~25% symmetric) this
            # cuts the dominant stage-1 loss term ~4x.
            #
            # Every batch-dim gather/scatter here is a one-hot einsum at
            # HIGHEST precision (exact: single nonzero per row, bf16
            # hi+lo splits reconstruct f32), NOT an indexing op. Gather
            # ops on inputs shared with the sibling branches flip XLA's
            # layout assignment for the (B, N, M, 3) hypothesis tensor to
            # row-major — trailing (M, 3) dims on the (8, 128) tile, a
            # 43x padding explosion that OOMs HBM at batch 32 (measured);
            # the K slots also re-transform the small inputs instead of
            # slicing the big tensor (same per-sample arithmetic).
            k = max_sym_slots
            prio = jnp.where(is_sym, 0, b) + jnp.arange(b, dtype=jnp.int32)
            order = jnp.argsort(prio)[:k]  # sym rows first, stable
            sel = jax.nn.one_hot(order, b, dtype=jnp.float32)  # (K, B)

            def gat(x):
                flat = x.reshape(b, -1).astype(jnp.float32)
                out = jnp.einsum("kb,bf->kf", sel, flat,
                                 precision=jax.lax.Precision.HIGHEST)
                return out.reshape((k,) + x.shape[1:]).astype(x.dtype)

            pred_k, _, _ = transform_hypotheses(
                gat(pred_r), gat(pred_t), gat(points), gat(model_points))
            adds_k = jax.vmap(
                _adds_distance
            )(pred_k, gat(target))  # (K, N)
            base = add_all(None)
            sym_k = gat(is_sym.astype(jnp.float32)[:, None])[:, 0]
            upd = jnp.where(sym_k[:, None] > 0.5, adds_k, gat(base))
            covered = jnp.einsum("kb->b", sel)
            return (base * (1.0 - covered[:, None]) +
                    jnp.einsum("kb,kn->bn", sel, upd,
                               precision=jax.lax.Precision.HIGHEST))

        # lax.switch: uniform batches (the reference's batch-1 always is)
        # compute only the distance they need — the O(N*M^2) ADD-S chamfer
        # is ~M x the ADD cost, so skipping it for asymmetric samples
        # matters in the hot loss
        n_sym = jnp.sum(is_sym)
        use_compact = (max_sym_slots is not None and 0 < max_sym_slots < b)
        branches = (add_all, adds_all, mixed) + ((compact,) if use_compact
                                                 else ())
        case = jnp.where(n_sym == 0, 0, jnp.where(n_sym == b, 1, 2))
        if use_compact:
            case = jnp.where((case == 2) & (n_sym <= max_sym_slots), 3, case)
        dis = jax.lax.switch(case, branches, None)
    else:
        dis = add_all(None)

    c_safe = jnp.maximum(c, 1e-12)
    loss = jnp.mean(dis * c - w * jnp.log(c_safe))

    # best-confidence hypothesis per sample -> re-centred outputs for refiner
    which_max = jnp.argmax(c, axis=-1)  # (B,)

    def take(arr):
        idx = which_max.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.take_along_axis(arr, idx, axis=1)[:, 0]
    best_t = take(t_cand)          # (B, 3)
    best_rot = take(rot)           # (B, 3, 3)
    best_dis = take(dis[..., None])[..., 0]  # (B,)

    # metric re-centring at HIGHEST (TPU f32 matmuls default to bf16
    # operands — fatal for coordinates fed back into the refiner loss)
    new_points = jnp.matmul(points - best_t[:, None, :], best_rot,
                            precision=jax.lax.Precision.HIGHEST)
    new_target = jnp.matmul(target - best_t[:, None, :], best_rot,
                            precision=jax.lax.Precision.HIGHEST)
    return PoseLossOut(
        loss=loss,
        dis=best_dis,
        new_points=jax.lax.stop_gradient(new_points),
        new_target=jax.lax.stop_gradient(new_target),
    )
