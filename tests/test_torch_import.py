"""Reference-checkpoint import tests: build a state_dict in the UPSTREAM
DenseFusion naming scheme (cnn.model.feats..., psp.stages.N.1, up_k.conv.1,
Conv1d heads), import it, and verify the flax tree round-trips exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.models.torch_import import (
    import_posenet_state_dict, import_refinenet_state_dict)


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def _export_upstream_posenet(variables):
    """flax tree -> upstream-named torch state_dict (inverse layouts)."""
    p = variables["params"]
    s = variables["batch_stats"]
    sd = {}

    def put_conv2d(name, layer):
        sd[name + ".weight"] = _t(np.asarray(layer["kernel"]).transpose(3, 2, 0, 1))
        if "bias" in layer:
            sd[name + ".bias"] = _t(layer["bias"])

    def put_bn(name, bn_p, bn_s):
        sd[name + ".weight"] = _t(bn_p["scale"])
        sd[name + ".bias"] = _t(bn_p["bias"])
        sd[name + ".running_mean"] = _t(bn_s["mean"])
        sd[name + ".running_var"] = _t(bn_s["var"])

    fe, se = p["cnn"]["feats"], s["cnn"]["feats"]
    for i in (1, 2, 3):
        put_conv2d(f"cnn.model.feats.conv{i}", fe[f"conv{i}"])
        put_bn(f"cnn.model.feats.bn{i}", fe[f"bn{i}"], se[f"bn{i}"])
    for li in range(1, 5):
        for bi in range(2):
            fb, sb = fe[f"layer{li}_block{bi}"], se[f"layer{li}_block{bi}"]
            base = f"cnn.model.feats.layer{li}.{bi}"
            put_conv2d(base + ".conv1", fb["conv1"])
            put_conv2d(base + ".conv2", fb["conv2"])
            put_bn(base + ".bn1", fb["bn1"], sb["bn1"])
            put_bn(base + ".bn2", fb["bn2"], sb["bn2"])
            if "downsample_conv" in fb:
                put_conv2d(base + ".downsample.0", fb["downsample_conv"])
                put_bn(base + ".downsample.1", fb["downsample_bn"],
                       sb["downsample_bn"])

    psp = p["cnn"]["psp"]
    for i in range(4):
        put_conv2d(f"cnn.model.psp.stages.{i}.1", psp[f"stage{i}_conv"])
    put_conv2d("cnn.model.psp.bottleneck", psp["bottleneck"])
    for k in (1, 2, 3):
        up = p["cnn"][f"up_{k}"]
        put_conv2d(f"cnn.model.up_{k}.conv.1", up["conv"])
        sd[f"cnn.model.up_{k}.conv.2.weight"] = _t(
            np.asarray(up["prelu_alpha"]).reshape(1))
    put_conv2d("cnn.model.final.0", p["cnn"]["final"])

    def put_conv1d(name, layer):
        sd[name + ".weight"] = _t(np.asarray(layer["kernel"]).T[:, :, None])
        sd[name + ".bias"] = _t(layer["bias"])

    for ln in ("conv1", "e_conv1", "conv2", "e_conv2", "conv5", "conv6"):
        put_conv1d(f"feat.{ln}", p["feat"][ln])
    for tag in ("r", "t", "c"):
        for i in range(1, 5):
            put_conv1d(f"conv{i}_{tag}", p[f"conv{i}_{tag}"])
    return sd


def test_posenet_import_roundtrip():
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    src = model.init(jax.random.key(1), *args)
    sd = _export_upstream_posenet(src)
    sd = {("module." + k if i % 2 else k): v  # exercise DataParallel prefixes
          for i, (k, v) in enumerate(sd.items())}

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_posenet_state_dict(sd, dst)
    assert unmatched == [], unmatched[:5]

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(src)[0],
            jax.tree_util.tree_flatten_with_path(dst)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    # imported model must produce identical outputs to the source
    out_a = model.apply(src, *args)
    out_b = model.apply(dst, *args)
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refinenet_import_roundtrip():
    model = PoseRefineNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
            jnp.zeros((1,), jnp.int32))
    src = model.init(jax.random.key(1), *args)

    p = src["params"]
    sd = {}
    for ln in ("conv1", "e_conv1", "conv2", "e_conv2", "conv5", "conv6"):
        sd[f"feat.{ln}.weight"] = _t(np.asarray(p["feat"][ln]["kernel"]).T[:, :, None])
        sd[f"feat.{ln}.bias"] = _t(p["feat"][ln]["bias"])
    for tag in ("r", "t"):
        for i in range(1, 4):
            lp = p[f"conv{i}_{tag}"]
            sd[f"conv{i}_{tag}.weight"] = _t(np.asarray(lp["kernel"]).T)  # Linear
            sd[f"conv{i}_{tag}.bias"] = _t(lp["bias"])

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_refinenet_state_dict(sd, dst)
    assert unmatched == []
    a = model.apply(src, *args)
    b = model.apply(dst, *args)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_import_shape_mismatch_raises():
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    var = model.init(jax.random.key(0), *args)
    bad = {"feat.conv1.weight": torch.zeros(64, 7, 1)}  # wrong in-dim
    with pytest.raises(ValueError, match="shape mismatch"):
        import_posenet_state_dict(bad, var)
