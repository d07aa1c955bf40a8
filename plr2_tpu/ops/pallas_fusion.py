"""Pallas TPU kernel fusing the per-point pose-head MLP stacks.

The reference's hot loop is a ladder of 1x1 Conv1d layers over the point
axis (lib/network.py conv1_r..conv4_r etc. — SURVEY.md section 2 #3/#4).
As plain XLA each layer is a matmul whose activations round-trip HBM; this
kernel keeps the whole 1408 -> 640 -> 256 -> 128 -> K ladder resident in
VMEM per 256-row block: one read of the fused feature, one write of the
head output, all four matmuls back-to-back on the MXU with fused ReLUs.

Gradient support: custom VJP with rematerialized backward (the backward
pass recomputes the two cheap intermediates and runs standard XLA matmuls
— MXU-bound either way; the fusion win is the forward HBM traffic).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                w4_ref, b4_ref, out_ref):
    # accumulate in f32 on the MXU; keep inter-layer activations in the
    # input dtype so the bf16 fast-inference mode stays on the bf16 MXU path
    dt = x_ref.dtype
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(dt)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:], 0.0).astype(dt)
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b3_ref[:], 0.0).astype(dt)
    h = jnp.dot(h, w4_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (h + b4_ref[:]).astype(out_ref.dtype)


def _forward(x, params, interpret: bool):
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params
    p = x.shape[0]
    pp = -(-p // _BLOCK_ROWS) * _BLOCK_ROWS
    xpad = jnp.pad(x, ((0, pp - p), (0, 0)))
    k = w4.shape[1]

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    b1r, b2r, b3r, b4r = (b.reshape(1, -1) for b in (b1, b2, b3, b4))
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, k), x.dtype),
        grid=(pp // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(w1), full(b1r), full(w2), full(b2r),
            full(w3), full(b3r), full(w4), full(b4r),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpad, w1, b1r, w2, b2r, w3, b3r, w4, b4r)
    return out[:p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_mlp_head(x: jnp.ndarray, params, interpret: bool = False):
    """x (P, C) x 4-layer (w, b) params -> (P, K); ReLU between layers."""
    return _forward(x, params, interpret)


def _fwd(x, params, interpret):
    return _forward(x, params, interpret), (x, params)


def _bwd(interpret, res, g):
    x, params = res
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params
    # rematerialize intermediates (plain XLA; MXU matmuls)
    h1 = jnp.maximum(x @ w1 + b1, 0.0)
    h2 = jnp.maximum(h1 @ w2 + b2, 0.0)
    h3 = jnp.maximum(h2 @ w3 + b3, 0.0)

    db4 = jnp.sum(g, axis=0)
    dw4 = h3.T @ g
    g3 = (g @ w4.T) * (h3 > 0)
    db3 = jnp.sum(g3, axis=0)
    dw3 = h2.T @ g3
    g2 = (g3 @ w3.T) * (h2 > 0)
    db2 = jnp.sum(g2, axis=0)
    dw2 = h1.T @ g2
    g1 = (g2 @ w2.T) * (h1 > 0)
    db1 = jnp.sum(g1, axis=0)
    dw1 = x.T @ g1
    dx = g1 @ w1.T
    return dx, ((dw1, db1), (dw2, db2), (dw3, db3), (dw4, db4))


fused_mlp_head.defvjp(_fwd, _bwd)


def head_params_from_tree(params, tag: str, depth: int = 4,
                          prefix: str = "conv") -> Tuple:
    """Extract ((w, b) x depth) for head `tag` from a PoseNet param tree."""
    out = []
    for i in range(1, depth + 1):
        layer = params[f"{prefix}{i}_{tag}"]
        out.append((layer["kernel"], layer["bias"]))
    return tuple(out)
