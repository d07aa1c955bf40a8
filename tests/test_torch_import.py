"""Reference-checkpoint migration tests, both directions.

Import: a state_dict in the UPSTREAM DenseFusion naming scheme
(cnn.model.feats..., psp.stages.N.1, up_k.conv.1, Conv1d heads) merges
into the flax tree exactly, including the `num_batches_tracked` buffers
every real torch BN checkpoint carries.

Export (models/torch_export.py): the emitted dict must (a) round-trip
through the importer to the identical variable tree, and (b) strict-load
into torch modules with the authentic upstream attribute names — whose
forward pass must then match the flax forward. (b) is the migration
guarantee: a .pth we export produces the same poses in reference-layout
torch code."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.models.torch_export import (
    export_posenet_state_dict, export_refinenet_state_dict)
from plr2_tpu.models.torch_import import (
    import_posenet_state_dict, import_refinenet_state_dict)


def _t(x):
    return torch.from_numpy(np.array(x))  # np.array copies: torch needs writable


def _as_torch(sd):
    return {k: _t(v) for k, v in sd.items()}


# ---------------- upstream-named torch modules ----------------
# Attribute names follow upstream lib/extractors.py / lib/pspnet.py /
# lib/network.py [upstream, mount empty] so torch's own state_dict key
# generation defines the layout the exporter must hit.

class _UBlock(tnn.Module):
    def __init__(self, inp, planes, stride=1, dil=1, down=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, dil, dil, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, dil, dil, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if down:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        r = self.downsample(x) if hasattr(self, "downsample") else x
        y = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(y)) + r)


class _UResNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3 = tnn.Conv2d(64, 128, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(128)
        self.layer1 = tnn.Sequential(_UBlock(128, 64, down=True),
                                     _UBlock(64, 64))
        self.layer2 = tnn.Sequential(_UBlock(64, 128, stride=2, down=True),
                                     _UBlock(128, 128))
        self.layer3 = tnn.Sequential(_UBlock(128, 256, dil=2, down=True),
                                     _UBlock(256, 256, dil=2))
        self.layer4 = tnn.Sequential(_UBlock(256, 512, dil=4, down=True),
                                     _UBlock(512, 512, dil=4))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x


class _UPSPModule(tnn.Module):
    def __init__(self, sizes=(1, 2, 3, 6)):
        super().__init__()
        self.sizes = sizes
        self.stages = tnn.ModuleList([
            tnn.Sequential(tnn.AdaptiveAvgPool2d(s),
                           tnn.Conv2d(512, 512, 1, bias=False))
            for s in sizes])
        self.bottleneck = tnn.Conv2d(512 * (len(sizes) + 1), 1024, 1)

    def forward(self, f):
        h, w = f.shape[2:]
        priors = [F.interpolate(st(f), (h, w), mode="bilinear",
                                align_corners=False)
                  for st in self.stages] + [f]
        return F.relu(self.bottleneck(torch.cat(priors, 1)))


class _UPSPUpsample(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            tnn.Conv2d(cin, cout, 3, padding=1),
            tnn.PReLU())

    def forward(self, x):
        return self.conv(x)


class _UPSPNet(tnn.Module):
    def __init__(self, emb_dim=32):
        super().__init__()
        self.feats = _UResNet()
        self.psp = _UPSPModule()
        self.up_1 = _UPSPUpsample(1024, 256)
        self.up_2 = _UPSPUpsample(256, 64)
        self.up_3 = _UPSPUpsample(64, 64)
        self.final = tnn.Sequential(tnn.Conv2d(64, emb_dim, 1),
                                    tnn.LogSoftmax(dim=1))

    def forward(self, x):
        p = self.psp(self.feats(x))
        return self.final(self.up_3(self.up_2(self.up_1(p))))


class _UModifiedResnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.model = _UPSPNet()

    def forward(self, x):
        return self.model(x)


class _UPoseNetFeat(tnn.Module):
    def __init__(self, num_points):
        super().__init__()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.e_conv1 = tnn.Conv1d(32, 64, 1)
        self.e_conv2 = tnn.Conv1d(64, 128, 1)
        self.conv5 = tnn.Conv1d(256, 512, 1)
        self.conv6 = tnn.Conv1d(512, 1024, 1)
        self.ap1 = tnn.AvgPool1d(num_points)

    def forward(self, x, emb):
        x = F.relu(self.conv1(x))
        e = F.relu(self.e_conv1(emb))
        f1 = torch.cat((x, e), 1)
        x = F.relu(self.conv2(x))
        e = F.relu(self.e_conv2(e))
        f2 = torch.cat((x, e), 1)
        y = F.relu(self.conv5(f2))
        y = F.relu(self.conv6(y))
        ap = self.ap1(y).repeat(1, 1, x.shape[2])
        return torch.cat([f1, f2, ap], 1)  # (B, 1408, N)


class _UPoseNet(tnn.Module):
    def __init__(self, num_points, num_obj):
        super().__init__()
        self.num_obj = num_obj
        self.cnn = _UModifiedResnet()
        self.feat = _UPoseNetFeat(num_points)
        for tag, od in (("r", 4), ("t", 3), ("c", 1)):
            setattr(self, f"conv1_{tag}", tnn.Conv1d(1408, 640, 1))
            setattr(self, f"conv2_{tag}", tnn.Conv1d(640, 256, 1))
            setattr(self, f"conv3_{tag}", tnn.Conv1d(256, 128, 1))
            setattr(self, f"conv4_{tag}", tnn.Conv1d(128, num_obj * od, 1))

    def forward(self, img, cloud, choose, obj):
        out_img = self.cnn(img)
        b, di = out_img.shape[:2]
        emb = out_img.reshape(b, di, -1)
        emb = torch.gather(emb, 2, choose.unsqueeze(1).repeat(1, di, 1))
        ap_x = self.feat(cloud.transpose(2, 1), emb)
        outs = {}
        for tag, od in (("r", 4), ("t", 3), ("c", 1)):
            h = F.relu(getattr(self, f"conv1_{tag}")(ap_x))
            h = F.relu(getattr(self, f"conv2_{tag}")(h))
            h = F.relu(getattr(self, f"conv3_{tag}")(h))
            h = getattr(self, f"conv4_{tag}")(h)
            h = h.view(b, self.num_obj, od, -1)
            sel = torch.stack([h[i, obj[i]] for i in range(b)])
            outs[tag] = sel.transpose(2, 1)  # (B, N, od)
        return (outs["r"], outs["t"], torch.sigmoid(outs["c"]),
                emb.transpose(2, 1))


class _UPoseRefineNetFeat(tnn.Module):
    def __init__(self, num_points):
        super().__init__()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.e_conv1 = tnn.Conv1d(32, 64, 1)
        self.e_conv2 = tnn.Conv1d(64, 128, 1)
        self.conv5 = tnn.Conv1d(384, 512, 1)
        self.conv6 = tnn.Conv1d(512, 1024, 1)
        self.ap1 = tnn.AvgPool1d(num_points)

    def forward(self, x, emb):
        x = F.relu(self.conv1(x))
        e = F.relu(self.e_conv1(emb))
        f1 = torch.cat((x, e), 1)
        x = F.relu(self.conv2(x))
        e = F.relu(self.e_conv2(e))
        f2 = torch.cat((x, e), 1)
        y = F.relu(self.conv5(torch.cat([f1, f2], 1)))
        y = F.relu(self.conv6(y))
        return self.ap1(y).view(-1, 1024)


class _UPoseRefineNet(tnn.Module):
    def __init__(self, num_points, num_obj):
        super().__init__()
        self.num_obj = num_obj
        self.feat = _UPoseRefineNetFeat(num_points)
        for tag, od in (("r", 4), ("t", 3)):
            setattr(self, f"conv1_{tag}", tnn.Linear(1024, 512))
            setattr(self, f"conv2_{tag}", tnn.Linear(512, 128))
            setattr(self, f"conv3_{tag}", tnn.Linear(128, num_obj * od))

    def forward(self, cloud, emb, obj):
        ap = self.feat(cloud.transpose(2, 1), emb.transpose(2, 1))
        b = ap.shape[0]
        outs = {}
        for tag, od in (("r", 4), ("t", 3)):
            h = F.relu(getattr(self, f"conv1_{tag}")(ap))
            h = F.relu(getattr(self, f"conv2_{tag}")(h))
            h = getattr(self, f"conv3_{tag}")(h).view(b, self.num_obj, od)
            outs[tag] = torch.stack([h[i, obj[i]] for i in range(b)])
        return outs["r"].unsqueeze(1), outs["t"].unsqueeze(1)


# ---------------- helpers ----------------

def _randomize_batch_stats(rng, variables):
    def _rand(path, x):
        r = rng.normal(size=x.shape).astype(np.float32)
        if any("var" in str(p) for p in path):
            return jnp.asarray(np.abs(r) * 0.5 + 0.3)
        return jnp.asarray(r * 0.3)

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        _rand, variables["batch_stats"])
    return variables


# ---------------- tests ----------------

def test_posenet_export_import_roundtrip(rng):
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    src = _randomize_batch_stats(rng, model.init(jax.random.key(1), *args))
    sd = _as_torch(export_posenet_state_dict(src))
    assert any(k.endswith("num_batches_tracked") for k in sd)
    sd = {("module." + k if i % 2 else k): v  # exercise DataParallel prefixes
          for i, (k, v) in enumerate(sd.items())}

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_posenet_state_dict(sd, dst)
    assert unmatched == [], unmatched[:5]

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(src)[0],
            jax.tree_util.tree_flatten_with_path(dst)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))

    # imported model must produce identical outputs to the source
    out_a = model.apply(src, *args)
    out_b = model.apply(dst, *args)
    for a, b in zip(out_a, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refinenet_export_import_roundtrip():
    model = PoseRefineNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
            jnp.zeros((1,), jnp.int32))
    src = model.init(jax.random.key(1), *args)
    sd = _as_torch(export_refinenet_state_dict(src))

    dst = model.init(jax.random.key(2), *args)
    dst, unmatched = import_refinenet_state_dict(sd, dst)
    assert unmatched == []
    a = model.apply(src, *args)
    b = model.apply(dst, *args)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_posenet_export_strict_loads_and_matches_forward(rng):
    """The exported .pth strict-loads into upstream-named torch modules and
    the torch forward reproduces the flax forward — the full train-here,
    deploy-on-reference migration path."""
    num_obj, n, hw = 3, 16, 48
    model = PoseNet(num_points=n, num_objects=num_obj)
    img = rng.normal(size=(2, hw, hw, 3)).astype(np.float32)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    choose = rng.integers(0, hw * hw, size=(2, n)).astype(np.int32)
    obj = np.array([0, 2], dtype=np.int32)
    variables = _randomize_batch_stats(rng, model.init(
        jax.random.key(0), jnp.asarray(img), jnp.asarray(cloud),
        jnp.asarray(choose), jnp.asarray(obj)))

    tm = _UPoseNet(n, num_obj).eval()
    tm.load_state_dict(_as_torch(export_posenet_state_dict(variables)),
                       strict=True)

    jr, jt, jc, jemb = model.apply(variables, jnp.asarray(img),
                                   jnp.asarray(cloud), jnp.asarray(choose),
                                   jnp.asarray(obj))
    with torch.no_grad():
        tr, tt, tc, temb = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                              torch.from_numpy(cloud),
                              torch.from_numpy(choose).long(),
                              torch.from_numpy(obj).long())
    np.testing.assert_allclose(np.asarray(jemb), temb.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-4)


def test_refinenet_export_strict_loads_and_matches_forward(rng):
    num_obj, n = 3, 16
    model = PoseRefineNet(num_points=n, num_objects=num_obj)
    cloud = rng.normal(size=(2, n, 3)).astype(np.float32)
    emb = rng.normal(size=(2, n, 32)).astype(np.float32)
    obj = np.array([1, 0], dtype=np.int32)
    variables = model.init(jax.random.key(0), jnp.asarray(cloud),
                           jnp.asarray(emb), jnp.asarray(obj))

    tm = _UPoseRefineNet(n, num_obj).eval()
    tm.load_state_dict(_as_torch(export_refinenet_state_dict(variables)),
                       strict=True)

    jr, jt = model.apply(variables, jnp.asarray(cloud), jnp.asarray(emb),
                         jnp.asarray(obj))
    with torch.no_grad():
        tr, tt = tm(torch.from_numpy(cloud), torch.from_numpy(emb),
                    torch.from_numpy(obj).long())
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jt), tt.numpy(), atol=1e-4)


def test_save_reference_checkpoint_roundtrip(tmp_path, rng):
    """tools/export_torch.py's core: variables tree -> .pth files torch can
    load -> load_reference_checkpoint recovers the identical tree."""
    from plr2_tpu.models.torch_export import save_reference_checkpoint
    from plr2_tpu.models.torch_import import load_reference_checkpoint

    pose = PoseNet(num_points=16, num_objects=3)
    refine = PoseRefineNet(num_points=16, num_objects=3)
    pargs = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
             jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    rargs = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
             jnp.zeros((1,), jnp.int32))
    src = {
        "posenet": _randomize_batch_stats(
            rng, pose.init(jax.random.key(1), *pargs)),
        "refiner": refine.init(jax.random.key(1), *rargs),
    }
    pp = str(tmp_path / "pose_model.pth")
    rp = str(tmp_path / "pose_refine_model.pth")
    save_reference_checkpoint(src, pp, rp)

    dst = {
        "posenet": pose.init(jax.random.key(2), *pargs),
        "refiner": refine.init(jax.random.key(2), *rargs),
    }
    dst = load_reference_checkpoint(pp, dst, rp)
    for name in ("posenet", "refiner"):
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(src[name])[0],
                jax.tree_util.tree_flatten_with_path(dst[name])[0]):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{name}/{pa}")


def test_import_shape_mismatch_raises():
    model = PoseNet(num_points=16, num_objects=3)
    args = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
            jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    var = model.init(jax.random.key(0), *args)
    bad = {"feat.conv1.weight": torch.zeros(64, 7, 1)}  # wrong in-dim
    with pytest.raises(ValueError, match="shape mismatch"):
        import_posenet_state_dict(bad, var)
