"""Pallas kernel correctness tests (interpret mode on the CPU backend; the
same code paths compile natively on TPU — exercised by bench/tools runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from plr2_tpu.ops.pallas_knn import (nn_match_pallas, nn_match_pallas_mxu,
                                     nn_distance_pallas)
from plr2_tpu.ops.pallas_fusion import fused_mlp_head, head_params_from_tree
from plr2_tpu.ops.knn import nn_distance_xla


def test_nn_match_pallas_equals_bruteforce(rng):
    pred = rng.normal(size=(700, 3)).astype(np.float32)
    target = rng.normal(size=(130, 3)).astype(np.float32)
    matched = np.asarray(nn_match_pallas(jnp.asarray(pred), jnp.asarray(target),
                                         interpret=True))
    d2 = ((pred[:, None, :] - target[None]) ** 2).sum(-1)
    expect = target[d2.argmin(-1)]
    np.testing.assert_allclose(matched, expect, atol=1e-5)


def test_nn_match_pallas_mxu_equals_bruteforce(rng):
    # the augmented-product (MXU-d2) variant: same first-argmin contract
    pred = rng.normal(size=(700, 3)).astype(np.float32) * 0.1
    target = rng.normal(size=(130, 3)).astype(np.float32) * 0.1
    matched = np.asarray(nn_match_pallas_mxu(
        jnp.asarray(pred), jnp.asarray(target), interpret=True))
    d2 = ((pred[:, None, :] - target[None]) ** 2).sum(-1)
    expect = target[d2.argmin(-1)]
    np.testing.assert_allclose(matched, expect, atol=1e-5)


def test_nn_match_pallas_mxu_tie_breaks_first(rng):
    target = np.array([[1.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32)
    pred = np.array([[1.1, 0, 0]], np.float32)
    matched = np.asarray(nn_match_pallas_mxu(
        jnp.asarray(pred), jnp.asarray(target), interpret=True))
    np.testing.assert_allclose(matched[0], [1.0, 0, 0], atol=1e-6)


def test_nn_match_pallas_tie_breaks_first(rng):
    # duplicate target points -> first index must win (value identical)
    target = np.array([[1.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]], np.float32)
    pred = np.array([[1.1, 0, 0]], np.float32)
    matched = np.asarray(nn_match_pallas(jnp.asarray(pred), jnp.asarray(target),
                                         interpret=True))
    np.testing.assert_allclose(matched[0], [1.0, 0, 0], atol=1e-6)


def test_nn_distance_pallas_matches_xla(rng):
    pred = rng.normal(size=(40, 24, 3)).astype(np.float32)
    target = rng.normal(size=(50, 3)).astype(np.float32)
    d_pallas = np.asarray(nn_distance_pallas(jnp.asarray(pred),
                                             jnp.asarray(target),
                                             interpret=True))
    d_xla = np.asarray(nn_distance_xla(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(d_pallas, d_xla, atol=1e-5)


def test_nn_distance_pallas_gradient_matches_xla(rng):
    pred = jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    g_p = jax.grad(lambda p: jnp.sum(nn_distance_pallas(p, target,
                                                        interpret=True)))(pred)
    g_x = jax.grad(lambda p: jnp.sum(nn_distance_xla(p, target)))(pred)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


def _rand_params(rng, dims):
    out = []
    for cin, cout in zip(dims[:-1], dims[1:]):
        w = (rng.normal(size=(cin, cout)) / np.sqrt(cin)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32) * 0.1
        out.append((jnp.asarray(w), jnp.asarray(b)))
    return tuple(out)


def _xla_mlp(x, params):
    h = x
    for i, (w, b) in enumerate(params):
        h = h @ w + b
        if i < len(params) - 1:
            h = jnp.maximum(h, 0.0)
    return h


def test_fused_mlp_head_matches_xla(rng):
    params = _rand_params(rng, [1408, 640, 256, 128, 84])
    x = jnp.asarray(rng.normal(size=(300, 1408)).astype(np.float32))
    out = fused_mlp_head(x, params, True)
    ref = _xla_mlp(x, params)
    assert out.shape == (300, 84)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_mlp_head_gradients_match_xla(rng):
    params = _rand_params(rng, [64, 32, 24, 16, 8])
    x = jnp.asarray(rng.normal(size=(40, 64)).astype(np.float32))

    def f_fused(x, params):
        return jnp.sum(fused_mlp_head(x, params, True) ** 2)

    def f_xla(x, params):
        return jnp.sum(_xla_mlp(x, params) ** 2)

    gx_f, gp_f = jax.grad(f_fused, argnums=(0, 1))(x, params)
    gx_x, gp_x = jax.grad(f_xla, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               rtol=1e-4, atol=1e-4)
    for (a_w, a_b), (b_w, b_b) in zip(gp_f, gp_x):
        np.testing.assert_allclose(np.asarray(a_w), np.asarray(b_w),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a_b), np.asarray(b_b),
                                   rtol=1e-4, atol=1e-4)


def test_head_params_from_tree():
    from plr2_tpu.models.posenet import PoseNet
    model = PoseNet(num_points=16, num_objects=3)
    var = model.init(jax.random.key(0), jnp.zeros((1, 48, 48, 3)),
                     jnp.zeros((1, 16, 3)), jnp.zeros((1, 16), jnp.int32),
                     jnp.zeros((1,), jnp.int32))
    params = head_params_from_tree(var["params"], "r")
    assert params[0][0].shape == (1408, 640)
    assert params[3][0].shape == (128, 3 * 4)


# ---------- fused upsample + conv3x3 + PReLU (ops/pallas_upsample.py) ----


def _upconv_case(rng, b, h, w, cin, cout):
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.1
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)) * 0.1
    return x, wk, bias, jnp.float32(0.25)


def test_upsample2x_bilinear_matches_resize(rng):
    from plr2_tpu.ops.pallas_upsample import upsample2x_bilinear

    for shape in [(2, 5, 7, 3), (1, 4, 4, 8), (2, 1, 1, 4)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        got = upsample2x_bilinear(x)
        want = jax.image.resize(
            x, (shape[0], 2 * shape[1], 2 * shape[2], shape[3]),
            method="linear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_bilinear_upscale_mm_matches_resize(rng):
    from plr2_tpu.models.pspnet import bilinear_upscale_mm

    for s in (1, 2, 3, 6):
        x = jnp.asarray(rng.normal(size=(2, s, s, 16)).astype(np.float32))
        got = bilinear_upscale_mm(x, 20, 20)
        want = jax.image.resize(x, (2, 20, 20, 16), method="linear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_fused_upconv_matches_xla(rng):
    from plr2_tpu.ops import pallas_upsample as pu

    x, wk, bias, alpha = _upconv_case(rng, 2, 5, 6, 16, 32)
    got = pu.fused_upconv3x3_prelu(x, wk, bias, alpha, True)
    want = pu.upconv3x3_prelu_xla(x, wk, bias, alpha)
    assert got.shape == (2, 10, 12, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_upconv_blocked_grid_matches_xla(rng, monkeypatch):
    """Exercise cout/row/cin grid blocking (the paths the TPU shapes hit)."""
    from plr2_tpu.ops import pallas_upsample as pu

    cases = [((2, 4, 4, 8, 128), (64, 2, 8)),   # 2 cout blocks, 2 row blocks
             ((1, 8, 7, 16, 64), (64, 4, 8)),   # 4 row blocks, 2 cin blocks
             ((2, 6, 6, 32, 64), (32, 2, 8))]   # all three axes blocked
    for shape, blocks in cases:
        monkeypatch.setattr(pu, "_pick_blocks", lambda *a: blocks)
        x, wk, bias, alpha = _upconv_case(rng, *shape)
        got = pu.fused_upconv3x3_prelu(x, wk, bias, alpha, True)
        want = pu.upconv3x3_prelu_xla(x, wk, bias, alpha)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_fused_upconv_gradients_match_xla(rng):
    from plr2_tpu.ops import pallas_upsample as pu

    x, wk, bias, alpha = _upconv_case(rng, 1, 4, 5, 8, 16)

    gf = jax.grad(lambda *a: jnp.sum(
        pu.fused_upconv3x3_prelu(*a, True) ** 2), argnums=(0, 1, 2, 3))(
        x, wk, bias, alpha)
    gx = jax.grad(lambda *a: jnp.sum(
        pu.upconv3x3_prelu_xla(*a) ** 2), argnums=(0, 1, 2, 3))(
        x, wk, bias, alpha)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
