"""Pallas TPU kernel for the ADD-S nearest-neighbour match — the TPU-native
equivalent of the reference's KNN CUDA extension (lib/knn/src/
knn_cuda_kernel.cu; SURVEY.md section 2 #1 and its native-components note).

Design (TPU-first, not a CUDA translation):
  * the (P, M2) pairwise squared-distance tile is computed on-chip per
    512-row block via an MXU inner product (|a|^2 - 2ab + |b|^2) and is
    never materialized in HBM — the XLA fallback streams a chunked (P, M2)
    matrix through HBM instead;
  * the kernel returns the MATCHED TARGET COORDINATES (first-argmin
    tie-break, like the reference's KNN gather), not indices: the loss then
    computes ||pred - stop_grad(matched)||, whose autodiff gradient equals
    the reference's gather-through-argmin backward exactly — no custom VJP
    needed;
  * the match is extracted with a second MXU matmul: a first-argmin one-hot
    row matrix times the target block.

Shapes: pred (H, M, 3) hypotheses x mesh points, target (M2, 3) shared GT
cloud -> matched (H, M, 3). All row counts are padded to the 512-row block
internally; target is padded with +1e9 sentinels (never the min).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512
_SENTINEL = 1e9


def _match_kernel(a_ref, bt_ref, b_ref, out_ref):
    """One block: a (BP, 3), bt (3, M2p), b (M2p, 3) -> matched coords.

    Distances use the direct (a-b)^2 expansion on the VPU — numerically
    exact (the |a|^2 - 2ab + |b|^2 MXU form cancels catastrophically for
    near-matching points, which is the common case in this loss).
    """
    a = a_ref[:]   # (BP, 3)
    bt = bt_ref[:]  # (3, M2p)
    b = b_ref[:]   # (M2p, 3)
    d2 = jnp.zeros((a.shape[0], bt.shape[1]), jnp.float32)
    for k in range(3):
        diff = a[:, k:k + 1] - bt[k:k + 1, :]            # (BP, M2p)
        d2 = d2 + diff * diff
    dmin = jnp.min(d2, axis=1, keepdims=True)            # (BP, 1)
    # first-occurrence one-hot over ties (reference KNN returns the first
    # index): among minima pick the smallest column index via iota
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.iinfo(jnp.int32).max
    min_col = jnp.min(jnp.where(d2 <= dmin, col, big), axis=1, keepdims=True)
    first = (col == min_col).astype(jnp.float32)
    # HIGHEST: the MXU's default bf16 input rounding would corrupt the
    # gathered coordinates (~3e-3 relative) — this matmul is a gather
    out_ref[:] = jax.lax.dot_general(
        first, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # (BP, 3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_match_pallas(pred_flat: jnp.ndarray, target: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """(P, 3) query points, (M2, 3) targets -> (P, 3) matched target coords."""
    p = pred_flat.shape[0]
    m2 = target.shape[0]
    pp = -(-p // _BLOCK_ROWS) * _BLOCK_ROWS
    m2p = -(-m2 // 128) * 128

    a = jnp.pad(pred_flat, ((0, pp - p), (0, 0)))
    b = jnp.pad(target, ((0, m2p - m2), (0, 0)),
                constant_values=_SENTINEL)
    bt = b.T  # (3, M2p): per-coordinate rows for lane-wise broadcasting

    out = pl.pallas_call(
        _match_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, 3), jnp.float32),
        grid=(pp // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2p, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.astype(jnp.float32), bt.astype(jnp.float32), b.astype(jnp.float32))
    return out[:p]


def nn_distance_pallas(pred: jnp.ndarray, target: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(H, M, 3), (M2, 3) -> (H, M) nearest-target distances.

    Gradient w.r.t. `pred` flows through ||pred - matched|| with the match
    held constant — identical to the reference's KNN-gather backward.
    """
    h, m, _ = pred.shape
    # stop_gradient on the INPUTS keeps the (non-differentiable) pallas_call
    # out of the autodiff graph entirely; the distance below carries the
    # gather-through-argmin gradient w.r.t. pred.
    matched = nn_match_pallas(
        jax.lax.stop_gradient(pred.reshape(-1, 3)),
        jax.lax.stop_gradient(target), interpret=interpret)
    matched = matched.reshape(h, m, 3)
    return jnp.linalg.norm(pred - matched, axis=-1)
