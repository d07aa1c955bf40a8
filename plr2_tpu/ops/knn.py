"""Nearest-neighbour / chamfer distance ops — the TPU-native equivalent of
the reference's KNN CUDA extension (upstream lib/knn/, SURVEY.md section 2
#1), used by the symmetric-object ADD-S loss.

The loss only consumes the *distance to the nearest target point* (the
reference gathers target rows through the 1-NN index and then takes a norm;
`min` has identical value and identical gradient — the subgradient flows
through the argmin element). A Pallas TPU kernel (pallas_knn.py) computes
the tiled distance + row-min without materializing the full pairwise
matrix; this module provides the dispatcher and a memory-chunked XLA
fallback used on CPU and for verification.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray,
                     precision: str = "highest") -> jnp.ndarray:
    """(..., P, 3) x (..., M, 3) -> (..., P, M) squared euclidean distances.

    Expressed MXU-style: |a|^2 + |b|^2 - 2 a.b, the inner product being a
    batched matmul.

    precision: "highest" (6-pass, default — the TPU bf16 single-pass
    matmul is far too coarse for metric distances and this form already
    cancels) or "high" (3-pass bf16, ~f32 product quality at half the MXU
    passes — safe when the result only drives argmin SELECTION and the
    distance is recomputed exactly from the selected coordinates).
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., P, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=precision)
    d2 = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d2, 0.0)


def safe_norm(diff: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with zero gradient at exactly zero (torch.norm's backward
    convention). Plain jnp.linalg.norm yields NaN gradients at 0 — and the
    cancellation-clamped pairwise d^2 hits exact zeros routinely once
    predictions approach targets, which then poisons training through the
    jnp.where ADD/ADD-S select (where does not block NaN cotangents)."""
    s = jnp.sum(diff * diff, axis=axis)
    positive = s > 0
    return jnp.sqrt(jnp.where(positive, s, 1.0)) * positive


def nn_match_cm(pred_cm: jnp.ndarray, target: jnp.ndarray,
                chunk: int = 65536) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-target match for flattened query points (no autodiff).

    pred_cm: (3, P) COORDINATE-MAJOR queries; target: (M2, 3). Returns
    (matched (3, P) nearest-target coordinates, dmin (P,) min squared
    distance — cancellation-clamped, selection-grade only), chunked over
    P to bound the live pairwise matrix at chunk*M2.

    This is the one implementation of the local argmin match: the dense
    chamfer (`nn_distance_xla`) and the target-sharded sequence-parallel
    chamfer (`parallel.point_parallel.sp_chamfer`, which selects across
    shards by dmin) both call it, so their per-element d2/argmin math is
    bitwise identical by construction.

    Everything here is deliberately coordinate-major: a (..., big, 3)
    tensor invites XLA to tile its last two dims onto the (8, 128)
    vregs — 3 lanes padded to 128, a 43x HBM blow-up that measurably
    OOMs the stage-1 training step when branch-layout negotiation picks
    row-major (see losses/add_loss.py `compact`). With (3, big) the
    minor dims are always large and every layout choice is benign."""
    p = pred_cm.shape[1]
    target_cm = target.T.astype(jnp.float32)             # (3, M2)
    b2 = jnp.sum(target_cm * target_cm, axis=0)          # (M2,)

    def block_match(block):                              # (3, C)
        a2 = jnp.sum(block * block, axis=0)              # (C,)
        ab = jnp.einsum("cp,cm->pm", block, target_cm,
                        precision=jax.lax.Precision.HIGH)
        d2 = jnp.maximum(a2[:, None] - 2.0 * ab + b2[None, :], 0.0)
        idx = jnp.argmin(d2, axis=-1)                    # first argmin
        dmin = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
        # matched = target_cm @ onehot^T instead of a row gather: a
        # gather of millions of 12-byte rows is descriptor-bound on TPU
        # (the tiny-trailing-dim gather pathology, see CLAUDE.md); the
        # one-hot contraction is MXU work XLA can fuse. HIGHEST keeps
        # the (single-nonzero) products exact.
        onehot = jax.nn.one_hot(idx, target.shape[0], dtype=jnp.float32)
        return jnp.einsum("cm,pm->cp", target_cm, onehot,
                          precision=jax.lax.Precision.HIGHEST), dmin

    if p <= chunk:
        return block_match(pred_cm)
    pad = (-p) % chunk
    pred_p = jnp.pad(pred_cm, ((0, 0), (0, pad)))
    nb = pred_p.shape[1] // chunk

    # fori_loop + dynamic slices along the (contiguous) point axis instead
    # of lax.map over a transposed block stack — the (3, nb, C)<->(nb, 3, C)
    # moveaxis copies are pure HBM traffic
    def body(i, carry):
        out, dm = carry
        blk = jax.lax.dynamic_slice(pred_p, (0, i * chunk), (3, chunk))
        m, d = block_match(blk)
        return (jax.lax.dynamic_update_slice(out, m, (0, i * chunk)),
                jax.lax.dynamic_update_slice(dm, d, (i * chunk,)))

    out, dm = jax.lax.fori_loop(
        0, nb, body, (jnp.zeros_like(pred_p),
                      jnp.zeros((pred_p.shape[1],), jnp.float32)))
    return out[:, :p], dm[:p]


@jax.custom_vjp
def nn_distance_xla(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """min_k ||pred_j - target_k|| for each pred point.

    pred: (H, M, 3) per-hypothesis transformed model points;
    target: (M2, 3) shared target cloud. Returns (H, M).

    Reference-faithful formulation: the pairwise matrix only selects the
    argmin index; the returned distance is the norm of the actual
    difference to the gathered match (exact — no cancellation — and with
    the gather-through-argmin gradient).

    custom_vjp: the backward is the closed form d||p - t*||/dp =
    (p - t*) / d (zero at d == 0, safe_norm's convention; t* held
    constant, matching the reference's KNN-gather backward and the
    previous stop_gradient formulation). Without it, autodiff hauls the
    chunked argmin scan into the residual graph — measured 208 ms for
    the batch-32 stage-1 loss step vs ~90 ms forward-only (v5e).

    All (3, H*M)-sized values (including the VJP residual) live
    coordinate-major so no layout choice can put the 3-sized axis on
    the 128-lane dimension (see nn_match_cm).
    """
    dis, _ = _nn_distance_fwd(pred, target)
    return dis


def _nn_distance_fwd(pred, target):
    h, m, _ = pred.shape
    p_cm = jnp.moveaxis(pred, -1, 0).reshape(3, h * m)
    matched_cm, _ = nn_match_cm(p_cm, target)
    diff_cm = p_cm - matched_cm                          # (3, H*M)
    dis_flat = safe_norm(diff_cm, axis=0)                # (H*M,)
    return dis_flat.reshape(h, m), (diff_cm, dis_flat, target.shape)


def _nn_distance_bwd(res, g):
    diff_cm, dis_flat, target_shape = res
    h, m = g.shape
    gf = g.reshape(h * m)
    scale = jnp.where(dis_flat > 0,
                      gf / jnp.where(dis_flat > 0, dis_flat, 1.0), 0.0)
    cot = jnp.moveaxis((scale[None, :] * diff_cm).reshape(3, h, m), 0, -1)
    # target receives no gradient (GT constant; the forward also held it
    # constant through the argmin gather)
    return cot, jnp.zeros(target_shape, diff_cm.dtype)


nn_distance_xla.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def nn_index(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Argmin index of the nearest target point for each pred point
    (the reference KNN extension's `inds`, 0-based here)."""
    return jnp.argmin(pairwise_sq_dist(pred, target), axis=-1)


@jax.jit
def chamfer_min_distance(pred: jnp.ndarray, target: jnp.ndarray
                         ) -> jnp.ndarray:
    """(H, M, 3), (M2, 3) -> (H, M) nearest-target distances.

    Always the chunked XLA path. A `use_pallas` routing knob existed
    through round 2 but never changed the outcome: measured on v5e
    (chained on-device loops, AFTER the round-2 XLA-path rewrites —
    one-hot matched coords, custom VJP, "high"-precision selection) the
    XLA path wins at EVERY target size (2.1 vs 6.8 ms at M2=500, 9.7 vs
    14.4 at 2048, 40 vs 47 at 8192; the round-1 Pallas wins at >1024
    were against the pre-rewrite XLA path with its jnp.take row gather),
    so the knob was collapsed rather than left as lying API surface.
    The VMEM-resident kernels (pallas_knn.py — VPU difference expansion
    at 6.6 ms, MXU augmented-product d2 at 8.3 ms vs XLA's 2.7 at
    production shape; the MXU pads K to 128 so a K=8 product costs the
    same as K=128, and XLA is already near that single-pass floor)
    remain the reference implementation and the escape hatch if the d2
    materialization ever exceeds HBM — call them directly. All paths are
    exact and share the gather-through-argmin gradient.
    """
    return nn_distance_xla(pred, target)
