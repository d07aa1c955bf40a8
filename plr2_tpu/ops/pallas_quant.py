"""Int8 quantization Pallas kernels (optional fast inference path).

Implements the TPU quantization pattern: per-row symmetric int8
quantization of activations with on-chip scale computation (stochastic
rounding via the per-core PRNG), int8 x int8 MXU matmuls with per-column
weight scales, dequantize + bias + ReLU fused in the epilogue.

Used by `quantized_mlp_head`, the int8 counterpart of
ops/pallas_fusion.fused_mlp_head for the 1408->640->256->128->K pose-head
ladder. Inference-only (no VJP); accuracy impact must be validated per
deployment — this ships as an opt-in mode.

Measured on v5e at the production head shape (8000x1408): 0.286 ms vs the
f32 fused kernel's 0.26 ms — the per-layer activation quantization passes
currently offset the int8 MXU gain, so this is a capability/pattern
demonstration (median rel. err 1.7%), not a speedup. CLOSED as a perf
lever (docs/PERF_NOTES.md): after the head-select commute the heads are
~4.7 ms/batch-128 and int8's ceiling (~2.3 ms) is under 7% end-to-end —
not worth the accuracy risk. Kept as the int8 serving pattern for models
where the head ladder dominates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 256


def quantize_weights(params) -> Tuple:
    """((w, b) x L) f32 -> ((w_i8, w_scale (Cout,), b) x L) host-side prep."""
    out = []
    for w, b in params:
        scale = jnp.max(jnp.abs(w), axis=0) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        out.append((w_i8, scale.astype(jnp.float32), b))
    return tuple(out)


def _make_qmlp_kernel(stochastic: bool):
    def kernel(seed_ref, x_ref, *refs):
        _qmlp_body(seed_ref, x_ref, refs, stochastic)
    return kernel


def _qmlp_body(seed_ref, x_ref, refs, stochastic):
    """x (BP, C0) f32; per layer: w_i8 (Cin, Cout), w_scale (1, Cout),
    b (1, Cout). Activations are re-quantized per layer with per-row
    scales; products accumulate in int32 on the MXU. `stochastic` uses the
    TPU PRNG for rounding (unbiased); the deterministic round-to-nearest
    path also serves CPU interpret mode, where the pltpu PRNG primitives
    are unavailable."""
    # refs layout: w0, s0, b0, w1, s1, b1, ..., out_ref
    out_ref = refs[-1]
    layers = [(refs[3 * i], refs[3 * i + 1], refs[3 * i + 2])
              for i in range((len(refs) - 1) // 3)]

    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0])
    h = x_ref[:]
    for li, (w_ref, s_ref, b_ref) in enumerate(layers):
        # per-row activation scale
        row_max = jnp.max(jnp.abs(h), axis=1, keepdims=True)
        a_scale = jnp.maximum(row_max / 127.0, 1e-12)
        scaled = h / a_scale
        if stochastic:
            # manual int8 stochastic rounding (pltpu.stochastic_round only
            # targets bf16/fp8): floor(x + U[0,1)) is unbiased
            bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape),
                                 jnp.uint32)
            # Mosaic lacks uint32->f32; >>8 fits in non-negative int32
            bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
            u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
            h_i8 = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)
        else:
            h_i8 = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            h_i8, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        h = acc.astype(jnp.float32) * a_scale * s_ref[:] + b_ref[:]
        if li < len(layers) - 1:
            h = jnp.maximum(h, 0.0)
    out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("interpret", "stochastic"))
def quantized_mlp_head(x: jnp.ndarray, qparams, seed: int | jnp.ndarray = 0,
                       interpret: bool = False,
                       stochastic: bool = True) -> jnp.ndarray:
    """x (P, C0) f32 -> (P, K) f32 through int8 layers (ReLU between)."""
    p, c0 = x.shape
    pp = -(-p // _BLOCK_ROWS) * _BLOCK_ROWS
    xpad = jnp.pad(x, ((0, pp - p), (0, 0)))
    k = qparams[-1][0].shape[1]

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    operands = [jnp.asarray([[seed]], jnp.int32)]
    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs.append(pl.BlockSpec((_BLOCK_ROWS, c0), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(xpad)
    for w_i8, s, b in qparams:
        operands += [w_i8, s.reshape(1, -1), b.reshape(1, -1)]
        in_specs += [full(w_i8), full(s.reshape(1, -1)), full(b.reshape(1, -1))]

    out = pl.pallas_call(
        _make_qmlp_kernel(stochastic and not interpret),
        out_shape=jax.ShapeDtypeStruct((pp, k), jnp.float32),
        grid=(pp // _BLOCK_ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_BLOCK_ROWS, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
    return out[:p]
