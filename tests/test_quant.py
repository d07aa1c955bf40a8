"""Int8 quantized head kernel tests (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from plr2_tpu.ops.pallas_quant import quantize_weights, quantized_mlp_head


def _rand_params(rng, dims, scale=1.0):
    out = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        w = (rng.normal(size=(cin, cout)) / np.sqrt(cin) * scale).astype(np.float32)
        b = (rng.normal(size=(cout,)) * 0.05).astype(np.float32)
        out.append((jnp.asarray(w), jnp.asarray(b)))
    return tuple(out)


def _f32_mlp(x, params):
    h = x
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i < len(params) - 1:
            h = jnp.maximum(h, 0.0)
    return h


def test_quantize_weights_roundtrip(rng):
    params = _rand_params(rng, [64, 32])
    (w_i8, s, b), = quantize_weights(params)
    assert w_i8.dtype == jnp.int8
    w_rec = w_i8.astype(np.float32) * np.asarray(s)[None, :]
    err = np.abs(w_rec - np.asarray(params[0][0])).max()
    assert err <= np.abs(np.asarray(params[0][0])).max() / 127.0 + 1e-7


def test_quantized_head_close_to_f32(rng):
    dims = [128, 64, 32, 16]
    params = _rand_params(rng, dims)
    q = quantize_weights(params)
    x = jnp.asarray(rng.normal(size=(40, 128)).astype(np.float32))
    ref = np.asarray(_f32_mlp(x, params))
    out = np.asarray(quantized_mlp_head(x, q, seed=0, interpret=True))
    assert out.shape == ref.shape
    # int8 with per-row/per-col scales: expect ~1-3% relative error
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    rel = np.abs(out - ref) / denom
    assert np.median(rel) < 0.05, np.median(rel)
    assert np.mean(rel) < 0.15, np.mean(rel)


def test_quantized_head_deterministic_per_seed(rng):
    params = _rand_params(rng, [64, 32, 8])
    q = quantize_weights(params)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    a = np.asarray(quantized_mlp_head(x, q, seed=3, interpret=True))
    b = np.asarray(quantized_mlp_head(x, q, seed=3, interpret=True))
    np.testing.assert_array_equal(a, b)
