"""Pallas TPU kernel for the ADD-S nearest-neighbour match — the TPU-native
equivalent of the reference's KNN CUDA extension (lib/knn/src/
knn_cuda_kernel.cu; SURVEY.md section 2 #1 and its native-components note).

Design (TPU-first, not a CUDA translation):
  * the (P, M2) pairwise squared-distance tile lives only in VMEM per
    1024-row block, computed with the exact per-coordinate difference
    expansion on the VPU (the |a|^2 - 2ab + |b|^2 MXU form both cancels
    catastrophically for near-matching points and costs 6-pass HIGHEST
    matmul passes that measured slower end-to-end);
  * the kernel emits the FIRST-argmin target index per query row (the
    reference KNN's tie-break); the matched coordinates are gathered
    outside by XLA, so distances recomputed from them are exact;
  * the loss computes ||pred - stop_grad(matched)||, whose autodiff
    gradient equals the reference's gather-through-argmin backward — no
    custom VJP needed.

Shapes: pred (H, M, 3) hypotheses x mesh points, target (M2, 3) shared GT
cloud -> matched (H, M, 3). Row counts are padded to the block internally;
target is padded with +1e9 sentinels (never the min).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 1024
_SENTINEL = 1e9


def _argmin_kernel(a_ref, bt_ref, out_ref):
    """One block: a (BP, 3), bt (3, M2p) -> first-argmin index (BP, 1)."""
    a = a_ref[:]    # (BP, 3)
    bt = bt_ref[:]  # (3, M2p) coordinate rows for lane-wise broadcast
    d2 = jnp.zeros((a.shape[0], bt.shape[1]), jnp.float32)
    for k in range(3):
        diff = a[:, k:k + 1] - bt[k:k + 1, :]            # (BP, M2p)
        d2 = d2 + diff * diff
    dmin = jnp.min(d2, axis=1, keepdims=True)            # (BP, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.iinfo(jnp.int32).max
    out_ref[:] = jnp.min(jnp.where(d2 <= dmin, col, big), axis=1,
                         keepdims=True)                  # (BP, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_argmin_pallas(pred_flat: jnp.ndarray, target: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """(P, 3) query points, (M2, 3) targets -> (P,) nearest-target indices."""
    p = pred_flat.shape[0]
    m2 = target.shape[0]
    m2p = -(-m2 // 128) * 128
    # keep the (rows, M2p) distance tile within a ~4 MB VMEM budget
    rows = min(_BLOCK_ROWS, max(128, (4 * 1024 * 1024 // (m2p * 4)) // 128 * 128))
    pp = -(-p // rows) * rows

    a = jnp.pad(pred_flat, ((0, pp - p), (0, 0)))
    bt = jnp.pad(target, ((0, m2p - m2), (0, 0)),
                 constant_values=_SENTINEL).T  # (3, M2p)

    idx = pl.pallas_call(
        _argmin_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, 1), jnp.int32),
        grid=(pp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.astype(jnp.float32), bt.astype(jnp.float32))
    return idx[:p, 0]


def _match_coords_kernel(a_ref, bt_ref, out_ref):
    """One block: a (BP, 3), bt (3, M2p) -> first-argmin target coords
    (BP, 3), selected in-VMEM via a one-hot MXU contraction — the indices
    never leave the kernel, so no XLA-side row gather exists at all."""
    a = a_ref[:]
    bt = bt_ref[:]
    d2 = jnp.zeros((a.shape[0], bt.shape[1]), jnp.float32)
    for k in range(3):
        diff = a[:, k:k + 1] - bt[k:k + 1, :]
        d2 = d2 + diff * diff
    dmin = jnp.min(d2, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.iinfo(jnp.int32).max
    amin = jnp.min(jnp.where(d2 <= dmin, col, big), axis=1, keepdims=True)
    onehot = (col == amin).astype(jnp.float32)  # (BP, M2p), one 1 per row
    # matched = onehot @ bt^T; single nonzero per row and HIGHEST keeps
    # the coordinate exact (bf16-pass splits reconstruct f32)
    out_ref[:] = jax.lax.dot_general(
        onehot, bt, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_match_pallas(pred_flat: jnp.ndarray, target: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(P, 3) query points, (M2, 3) targets -> (P, 3) matched target
    coords, entirely in-kernel (first-argmin tie-break)."""
    p = pred_flat.shape[0]
    m2 = target.shape[0]
    m2p = -(-m2 // 128) * 128
    rows = min(_BLOCK_ROWS, max(128, (4 * 1024 * 1024 // (m2p * 4)) // 128 * 128))
    pp = -(-p // rows) * rows

    a = jnp.pad(pred_flat, ((0, pp - p), (0, 0)))
    bt = jnp.pad(target, ((0, m2p - m2), (0, 0)),
                 constant_values=_SENTINEL).T  # (3, M2p)

    matched = pl.pallas_call(
        _match_coords_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, 3), jnp.float32),
        grid=(pp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.astype(jnp.float32), bt.astype(jnp.float32))
    return matched[:p]


def _match_coords_kernel_mxu(aug_a_ref, aug_b_ref, bt_ref, out_ref):
    """MXU-d2 variant: aug_a (BP, 8), aug_b (8, M2p), bt (3, M2p) ->
    first-argmin target coords (BP, 3).

    d2 comes off the MXU in ONE augmented product instead of the VPU
    difference expansion: with aug_a rows [ax, ay, az, |a|^2, 1, 0, 0, 0]
    and aug_b columns [-2bx, -2by, -2bz, 1, |b|^2, 0, 0, 0]^T the dot is
    exactly |a|^2 - 2 a.b + |b|^2. HIGHEST (6-pass bf16 split) keeps the
    products f32-quality; the |a|^2 / |b|^2 passthrough columns multiply
    an exact 1.0 so their hi+lo split reconstructs exactly. Cancellation
    only perturbs the argmin SELECTION between near-equidistant targets
    (the coordinates gathered below are exact, so the recomputed distance
    is too) — the same trade the XLA path's "high"-precision selection
    makes (ops/knn.py). Leaves ~5 VPU passes/element (two lane-min
    reductions, compare/select, one-hot compare) vs ~13 for the
    difference-expansion kernel above."""
    d2 = jax.lax.dot_general(
        aug_a_ref[:], aug_b_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (BP, M2p)
    dmin = jnp.min(d2, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.iinfo(jnp.int32).max
    amin = jnp.min(jnp.where(d2 <= dmin, col, big), axis=1, keepdims=True)
    onehot = (col == amin).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        onehot, bt_ref[:], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_match_pallas_mxu(pred_flat: jnp.ndarray, target: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """(P, 3) query points, (M2, 3) targets -> (P, 3) matched target
    coords; d2 on the MXU via the augmented product (see kernel)."""
    p = pred_flat.shape[0]
    m2 = target.shape[0]
    m2p = -(-m2 // 128) * 128
    rows = min(_BLOCK_ROWS, max(128, (4 * 1024 * 1024 // (m2p * 4)) // 128 * 128))
    pp = -(-p // rows) * rows

    a = jnp.pad(pred_flat.astype(jnp.float32), ((0, pp - p), (0, 0)))
    b = target.astype(jnp.float32)
    ones = jnp.ones((pp, 1), jnp.float32)
    aug_a = jnp.concatenate(
        [a, jnp.sum(a * a, axis=1, keepdims=True), ones,
         jnp.zeros((pp, 3), jnp.float32)], axis=1)       # (PP, 8)
    b2 = jnp.sum(b * b, axis=1)
    # padded target columns: -2b rows 0, |b|^2 row = sentinel -> their d2
    # is |a|^2 + 1e9, never the min
    aug_b = jnp.concatenate([
        jnp.pad(-2.0 * b.T, ((0, 0), (0, m2p - m2))),
        jnp.pad(jnp.ones((1, m2), jnp.float32), ((0, 0), (0, m2p - m2))),
        jnp.pad(b2[None, :], ((0, 0), (0, m2p - m2)),
                constant_values=_SENTINEL),
        jnp.zeros((3, m2p), jnp.float32)], axis=0)       # (8, M2p)
    bt = jnp.pad(b.T, ((0, 0), (0, m2p - m2)))           # (3, M2p)

    matched = pl.pallas_call(
        _match_coords_kernel_mxu,
        out_shape=jax.ShapeDtypeStruct((pp, 3), jnp.float32),
        grid=(pp // rows,),
        in_specs=[
            pl.BlockSpec((rows, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(aug_a, aug_b, bt)
    return matched[:p]


def nn_distance_pallas(pred: jnp.ndarray, target: jnp.ndarray,
                       interpret: bool = False,
                       mxu: bool = False) -> jnp.ndarray:
    """(H, M, 3), (M2, 3) -> (H, M) nearest-target distances.

    Gradient w.r.t. `pred` flows through ||pred - matched|| with the match
    held constant — identical to the reference's KNN-gather backward.
    `mxu=True` selects the augmented-product kernel (d2 on the MXU).
    """
    h, m, _ = pred.shape
    match_fn = nn_match_pallas_mxu if mxu else nn_match_pallas
    # stop_gradient on the INPUTS keeps the (non-differentiable) pallas_call
    # out of the autodiff graph entirely; the distance below carries the
    # gather-through-argmin gradient w.r.t. pred.
    matched = match_fn(
        jax.lax.stop_gradient(pred.reshape(-1, 3)),
        jax.lax.stop_gradient(target), interpret=interpret)
    matched = matched.reshape(h, m, 3)
    from plr2_tpu.ops.knn import safe_norm
    return safe_norm(pred - matched)
