"""Model tests: PyTorch-semantics oracles for the encoder building blocks
(torch-cpu as the oracle, mirroring the reference's framework), plus shape /
finiteness / jit checks for PoseNet and PoseRefineNet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plr2_tpu.models.pspnet import adaptive_avg_pool_2d, bilinear_resize, PSPNet
from plr2_tpu.models.resnet import DilatedResNet18, _max_pool_3x3_s2
from plr2_tpu.models.posenet import PoseNet, PoseRefineNet, gather_emb

torch = pytest.importorskip("torch")


# ---------- PyTorch-semantics oracles ----------

@pytest.mark.parametrize("hw,out", [(20, 1), (20, 2), (20, 3), (20, 6), (17, 3), (5, 2)])
def test_adaptive_avg_pool_matches_torch(rng, hw, out):
    x = rng.normal(size=(2, hw, hw, 8)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool_2d(jnp.asarray(x), out))
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), (out, out)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("h_in,h_out", [(3, 20), (2, 20), (10, 20), (20, 40)])
def test_bilinear_resize_matches_torch_no_align_corners(rng, h_in, h_out):
    x = rng.normal(size=(1, h_in, h_in, 4)).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), h_out, h_out))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(h_out, h_out),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_maxpool_matches_torch(rng):
    x = rng.normal(size=(1, 40, 40, 4)).astype(np.float32)
    ours = np.asarray(_max_pool_3x3_s2(jnp.asarray(x)))
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=2, padding=1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# ---------- structural checks ----------

def test_resnet_output_stride_8():
    m = DilatedResNet18()
    x = jnp.zeros((1, 80, 80, 3))
    var = m.init(jax.random.key(0), x)
    y = m.apply(var, x)
    assert y.shape == (1, 10, 10, 512)


def test_pspnet_full_resolution_embedding():
    m = PSPNet(emb_dim=32)
    x = jnp.zeros((1, 80, 80, 3))
    var = m.init(jax.random.key(0), x)
    y = m.apply(var, x)
    assert y.shape == (1, 80, 80, 32)
    assert bool(jnp.isfinite(y).all())
    # log_softmax output: logsumexp over channels == 0
    lse = jax.scipy.special.logsumexp(y, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


def test_gather_emb(rng):
    emb_map = jnp.asarray(rng.normal(size=(2, 4, 5, 3)).astype(np.float32))
    choose = jnp.asarray(rng.integers(0, 20, size=(2, 7)).astype(np.int32))
    out = gather_emb(emb_map, choose)
    assert out.shape == (2, 7, 3)
    flat = np.asarray(emb_map).reshape(2, 20, 3)
    for b in range(2):
        for i, c in enumerate(np.asarray(choose)[b]):
            np.testing.assert_array_equal(np.asarray(out)[b, i], flat[b, c])


@pytest.fixture(scope="module")
def posenet_setup():
    n, num_obj, hw = 64, 13, 48
    model = PoseNet(num_points=n, num_objects=num_obj)
    img = jnp.zeros((2, hw, hw, 3))
    cloud = jax.random.normal(jax.random.key(1), (2, n, 3))
    choose = jax.random.randint(jax.random.key(2), (2, n), 0, hw * hw)
    obj = jnp.array([0, num_obj - 1], dtype=jnp.int32)
    var = model.init(jax.random.key(0), img, cloud, choose, obj)
    return model, var, (img, cloud, choose, obj)


def test_posenet_shapes_and_ranges(posenet_setup):
    model, var, args = posenet_setup
    pred_r, pred_t, pred_c, emb = model.apply(var, *args)
    b, n = args[1].shape[0], args[1].shape[1]
    assert pred_r.shape == (b, n, 4)
    assert pred_t.shape == (b, n, 3)
    assert pred_c.shape == (b, n, 1)
    assert emb.shape == (b, n, 32)
    c = np.asarray(pred_c)
    assert (c > 0).all() and (c < 1).all()
    for t in (pred_r, pred_t, pred_c, emb):
        assert bool(jnp.isfinite(t).all())


def test_posenet_object_selection_differs(posenet_setup):
    """Different obj index must select different head rows."""
    model, var, (img, cloud, choose, _) = posenet_setup
    r0, *_ = model.apply(var, img, cloud, choose, jnp.array([0, 0]))
    r1, *_ = model.apply(var, img, cloud, choose, jnp.array([1, 1]))
    assert not np.allclose(np.asarray(r0), np.asarray(r1))


def test_posenet_jit_and_grad(posenet_setup):
    model, var, args = posenet_setup

    @jax.jit
    def loss_fn(params):
        pred_r, pred_t, pred_c, _ = model.apply({"params": params, **{k: v for k, v in var.items() if k != "params"}}, *args)
        return jnp.sum(pred_r ** 2) + jnp.sum(pred_t ** 2) + jnp.sum(pred_c)

    g = jax.grad(loss_fn)(var["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # gradient must reach the CNN trunk
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    cnn_norms = [float(jnp.abs(v).max()) for p, v in flat if "cnn" in str(p)]
    assert max(cnn_norms) > 0


def test_refinenet_shapes():
    n, num_obj = 64, 13
    model = PoseRefineNet(num_points=n, num_objects=num_obj)
    cloud = jax.random.normal(jax.random.key(1), (2, n, 3))
    emb = jax.random.normal(jax.random.key(2), (2, n, 32))
    obj = jnp.array([3, 7], dtype=jnp.int32)
    var = model.init(jax.random.key(0), cloud, emb, obj)
    pred_r, pred_t = model.apply(var, cloud, emb, obj)
    assert pred_r.shape == (2, 1, 4)
    assert pred_t.shape == (2, 1, 3)
    assert bool(jnp.isfinite(pred_r).all() and jnp.isfinite(pred_t).all())


def test_posenet_param_count_ladder(posenet_setup):
    """Dimension ladder sanity: key layer shapes match the reference contract."""
    _, var, _ = posenet_setup
    p = var["params"]
    assert p["feat"]["conv1"]["kernel"].shape == (3, 64)
    assert p["feat"]["e_conv1"]["kernel"].shape == (32, 64)
    assert p["feat"]["conv5"]["kernel"].shape == (256, 512)
    assert p["feat"]["conv6"]["kernel"].shape == (512, 1024)
    assert p["conv1_r"]["kernel"].shape == (1408, 640)
    assert p["conv4_r"]["kernel"].shape == (128, 13 * 4)
    assert p["conv4_t"]["kernel"].shape == (128, 13 * 3)
    assert p["conv4_c"]["kernel"].shape == (128, 13 * 1)


def test_posenet_pallas_path_matches_xla_path(rng):
    """use_pallas=True (fused head + fused upsample kernels, interpret on
    CPU) must produce the identical parameter tree and matching outputs."""
    from plr2_tpu.models.posenet import PoseNet

    n, num_obj = 24, 4
    m_xla = PoseNet(num_points=n, num_objects=num_obj, use_pallas=False)
    m_pls = PoseNet(num_points=n, num_objects=num_obj, use_pallas=True)
    img = jnp.asarray(rng.normal(size=(2, 48, 48, 3)).astype(np.float32))
    cloud = jnp.asarray(rng.normal(size=(2, n, 3)).astype(np.float32)) * 0.1
    choose = jnp.asarray(rng.integers(0, 48 * 48, size=(2, n)), jnp.int32)
    obj = jnp.asarray([1, 3], jnp.int32)
    v_xla = m_xla.init(jax.random.key(0), img, cloud, choose, obj)
    v_pls = m_pls.init(jax.random.key(0), img, cloud, choose, obj)
    assert (jax.tree_util.tree_structure(v_xla)
            == jax.tree_util.tree_structure(v_pls))
    assert (jax.tree_util.tree_map(lambda a: a.shape, v_xla)
            == jax.tree_util.tree_map(lambda a: a.shape, v_pls))
    out_x = m_xla.apply(v_xla, img, cloud, choose, obj)
    out_p = m_pls.apply(v_xla, img, cloud, choose, obj)  # shared params
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sparse_decode_matches_dense_gather(rng):
    """The sparse final-upsample decode (evaluated only at chosen pixels)
    must equal the dense stage + gather exactly — border/corner pixels
    included (conv zero padding and clamped upsample taps)."""
    import dataclasses

    sparse = PSPNet(emb_dim=8, sparse_decode=True)
    dense = PSPNet(emb_dim=8, sparse_decode=False)

    hw = 32  # feature path: 4 -> 8 -> 16 -> 32
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 3)).astype(np.float32))
    # corners, edges, and random interior pixels of the 32x32 output
    border = [0, hw - 1, hw * (hw - 1), hw * hw - 1, 5, hw * 3,
              hw * hw - hw, hw + 1]
    rand = rng.integers(0, hw * hw, size=24).tolist()
    choose = jnp.asarray(
        np.stack([border + rand, list(reversed(border + rand))]),
        dtype=jnp.int32)

    variables = sparse.init(jax.random.key(0), x, choose=choose)
    # identical parameter trees -> dense module can apply the same vars
    out_s = sparse.apply(variables, x, choose=choose)
    out_d = dense.apply(variables, x, choose=choose)
    assert out_s.shape == out_d.shape == (2, choose.shape[1], 8)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               atol=2e-5)

    # gradients through the sparse path stay finite and match the dense
    # path (same math, different evaluation set)
    def loss(fn_vars, module):
        return jnp.sum(module.apply(fn_vars, x, choose=choose) ** 2)

    gs = jax.grad(lambda v: loss(v, sparse))(variables)
    gd = jax.grad(lambda v: loss(v, dense))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gd)):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_phase_upsample_matches_dense_path(rng):
    """phase_upsample=True (phase-decomposed upconv stages + phase-aware
    up_3 gather) must equal the dense upsample->conv->gather path exactly,
    borders/corners included, with the identical parameter tree."""
    phase = PSPNet(emb_dim=8, phase_upsample=True)
    dense = PSPNet(emb_dim=8, phase_upsample=False)

    hw = 32
    x = jnp.asarray(rng.normal(size=(2, hw, hw, 3)).astype(np.float32))
    border = [0, hw - 1, hw * (hw - 1), hw * hw - 1, 5, hw * 3,
              hw * hw - hw, hw + 1]
    rand = rng.integers(0, hw * hw, size=24).tolist()
    choose = jnp.asarray(
        np.stack([border + rand, list(reversed(border + rand))]),
        dtype=jnp.int32)

    variables = phase.init(jax.random.key(0), x, choose=choose)
    out_p = phase.apply(variables, x, choose=choose)
    out_d = dense.apply(variables, x, choose=choose)
    assert out_p.shape == out_d.shape == (2, choose.shape[1], 8)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d),
                               atol=2e-5)

    # dense (no-choose) full-map comparison exercises depth-to-space
    full_p = phase.apply(variables, x)
    full_d = dense.apply(variables, x)
    np.testing.assert_allclose(np.asarray(full_p), np.asarray(full_d),
                               atol=2e-5)

    # gradients flow identically through the phase path
    def loss(v, module):
        return jnp.sum(module.apply(v, x, choose=choose) ** 2)

    gp = jax.grad(lambda v: loss(v, phase))(variables)
    gd = jax.grad(lambda v: loss(v, dense))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gd)):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    # the scan-safe hand-derived phase backward (ops/phase_upconv.py
    # _phase_conv_flat_cv: dgrad convs + shifted-einsum wgrads) is a true
    # transpose: same grads as the dense path's autodiff
    scan_safe = PSPNet(emb_dim=8, phase_upsample=True,
                       scan_safe_phase_vjp=True)
    gs = jax.grad(lambda v: loss(v, scan_safe))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gd)):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_phase_upconv_scan_safe_vjp_bf16(rng):
    """The hand-derived phase backward must keep cotangent dtypes aligned
    in bf16 compute (custom_vjp hard-errors on mismatch) and produce
    finite, close-to-f32 grads on a non-square map — the mixed-precision
    fused-scan configuration."""
    from plr2_tpu.ops.phase_upconv import phase_upconv3x3_prelu

    x32 = jnp.asarray(rng.normal(size=(2, 5, 9, 4)).astype(np.float32))
    k32 = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    b32 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss(x, k, b, dtype, scan_safe):
        y = phase_upconv3x3_prelu(x.astype(dtype), k, b,
                                  jnp.float32(0.25),
                                  scan_safe_vjp=scan_safe)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(
        x32, k32, b32, jnp.float32, True)
    g_bf = jax.grad(loss, argnums=(0, 1, 2))(
        x32, k32, b32, jnp.bfloat16, True)
    for a, b in zip(g_bf, g_ref):
        assert a.dtype == b.dtype == jnp.float32  # grads wrt f32 leaves
        assert bool(jnp.isfinite(a).all())
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(np.asarray(a, np.float64) / scale,
                                   np.asarray(b, np.float64) / scale,
                                   atol=0.06)  # bf16 compute noise


def test_phase_upconv_non_square_shapes(rng):
    """Phase-decomposed upconv must stay exact on non-square maps and
    odd channel counts (border corrections index rows and cols
    separately)."""
    from plr2_tpu.ops.phase_upconv import phase_upconv3x3_prelu
    from plr2_tpu.models.pspnet import bilinear_resize

    for (h, w, cin, cout) in [(5, 9, 4, 3), (12, 6, 8, 16), (3, 3, 2, 5)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        up = bilinear_resize(x, 2 * h, 2 * w)
        ref = jax.lax.conv_general_dilated(
            up, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        ref = jnp.where(ref >= 0, ref, 0.25 * ref)
        got = phase_upconv3x3_prelu(x, k, b, jnp.float32(0.25))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, err_msg=f"{h}x{w} {cin}->{cout}")


def test_gather_rows_onehot_backward_matches_scatter(rng):
    """ops.gather.gather_rows: forward equals take_along_axis; the one-hot
    MXU backward equals the scatter-add autodiff transpose exactly."""
    from plr2_tpu.ops.gather import gather_rows

    y = jnp.asarray(rng.normal(size=(3, 40, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(3, 7)).astype(np.int32))
    ref = jnp.take_along_axis(y, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(gather_rows(y, idx)), ref)

    def loss(fn, yy):
        g = fn(yy, idx)
        return jnp.sum(jnp.sin(g) * g)

    g_ref = jax.grad(lambda yy: loss(
        lambda a, b: jnp.take_along_axis(a, b[..., None], axis=1), yy))(y)
    g_new = jax.grad(lambda yy: loss(gather_rows, yy))(y)
    # duplicate indices must accumulate, zeros elsewhere
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
