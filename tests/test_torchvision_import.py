"""torchvision resnet18 -> DilatedResNet18 partial pretrained import
(VERDICT round-2 next-steps #4).

The deep-stem pspnet-style trunk has no torchvision counterpart for its
stem or layer1-block0 input width, so the import is partial by design:
all shape-compatible convs (layers 2-4 complete + layer1's remaining
convs) plus exactly the BatchNorms whose conv imported. Verified here
with a fabricated state_dict in torchvision's exact key/shape layout
(no network in this environment — real weights load through the same
path), then forward-parity of the imported trunk against the PyTorch
deep-stem mirror carrying the same transplanted tensors.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from plr2_tpu.models.resnet import DilatedResNet18
from plr2_tpu.models.torch_import import (
    _conv2d, import_torchvision_resnet18)


def _fake_torchvision_resnet18_sd(seed=0):
    """torchvision.models.resnet18 state_dict layout, random values."""
    rng = np.random.default_rng(seed)
    sd = {}

    def add(name, shape):
        sd[name] = torch.tensor(
            rng.standard_normal(shape).astype(np.float32) * 0.1)

    def add_bn(prefix, ch):
        add(f"{prefix}.weight", (ch,))
        add(f"{prefix}.bias", (ch,))
        add(f"{prefix}.running_mean", (ch,))
        sd[f"{prefix}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, (ch,)).astype(np.float32))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    add("conv1.weight", (64, 3, 7, 7))
    add_bn("bn1", 64)
    specs = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for li, (inp, planes) in specs.items():
        for bi in range(2):
            p = f"layer{li}.{bi}"
            cin = inp if bi == 0 else planes
            add(f"{p}.conv1.weight", (planes, cin, 3, 3))
            add_bn(f"{p}.bn1", planes)
            add(f"{p}.conv2.weight", (planes, planes, 3, 3))
            add_bn(f"{p}.bn2", planes)
            if bi == 0 and li > 1:
                add(f"{p}.downsample.0.weight", (planes, cin, 1, 1))
                add_bn(f"{p}.downsample.1", planes)
    add("fc.weight", (1000, 512))
    add("fc.bias", (1000,))
    return sd


@pytest.fixture(scope="module")
def imported():
    trunk = DilatedResNet18()
    tv = trunk.init(jax.random.key(0), jnp.zeros((1, 80, 80, 3)))
    wrapped = {"params": {"cnn": {"feats": tv["params"]}},
               "batch_stats": {"cnn": {"feats": tv["batch_stats"]}}}
    sd = _fake_torchvision_resnet18_sd()
    wrapped, imp, skip = import_torchvision_resnet18(sd, wrapped)
    new_vars = {"params": wrapped["params"]["cnn"]["feats"],
                "batch_stats": wrapped["batch_stats"]["cnn"]["feats"]}
    return trunk, new_vars, sd, imp, skip


def test_import_coverage_is_exactly_the_compatible_set(imported):
    _, _, sd, imp, skip = imported
    # 18 compatible convs (layer1: 3, layers 2-4: 5 each) + 18 BNs x 4
    assert len(imp) == 18 + 18 * 4
    assert set(imp) | set(skip) == set(sd)
    assert not set(imp) & set(skip)
    # structural skips: the deep stem, layer1 block0's first conv+bn, fc
    must_skip = {"conv1.weight", "layer1.0.conv1.weight", "fc.weight",
                 "fc.bias"}
    must_skip |= {f"bn1.{l}" for l in
                  ("weight", "bias", "running_mean", "running_var")}
    must_skip |= {f"layer1.0.bn1.{l}" for l in
                  ("weight", "bias", "running_mean", "running_var")}
    assert must_skip <= set(skip)
    # everything else skipped is torch BN bookkeeping
    assert all(k.endswith("num_batches_tracked")
               for k in set(skip) - must_skip)


def test_imported_tensors_match_source_layout(imported):
    _, new_vars, sd, _, _ = imported
    feats_p, feats_s = new_vars["params"], new_vars["batch_stats"]
    np.testing.assert_array_equal(
        np.asarray(feats_p["layer2_block0"]["conv1"]["kernel"]),
        _conv2d(sd["layer2.0.conv1.weight"].numpy()))
    np.testing.assert_array_equal(
        np.asarray(feats_p["layer4_block1"]["conv2"]["kernel"]),
        _conv2d(sd["layer4.1.conv2.weight"].numpy()))
    np.testing.assert_array_equal(
        np.asarray(feats_p["layer3_block0"]["downsample_conv"]["kernel"]),
        _conv2d(sd["layer3.0.downsample.0.weight"].numpy()))
    np.testing.assert_array_equal(
        np.asarray(feats_p["layer2_block1"]["bn2"]["scale"]),
        sd["layer2.1.bn2.weight"].numpy())
    np.testing.assert_array_equal(
        np.asarray(feats_s["layer2_block1"]["bn2"]["var"]),
        sd["layer2.1.bn2.running_var"].numpy())
    # skipped conv's BN stays at init (mean 0 / var 1)
    np.testing.assert_array_equal(
        np.asarray(feats_s["layer1_block0"]["bn1"]["mean"]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(feats_s["layer1_block0"]["bn1"]["var"]), 1.0)


def test_imported_trunk_forward_matches_torch_mirror(imported):
    """The post-import trunk == the deep-stem PyTorch mirror carrying the
    same (transplanted) tensors — pins that the partial load produced a
    coherent parameter tree, not just individually-copied arrays."""
    # the mirror moved to the package so tools/verify_reference.py can
    # reuse it (round 4); this test follows it there
    from plr2_tpu.models import torch_mirror as ttp

    trunk, new_vars, _, _, _ = imported
    tm = ttp.TResNet18().eval()
    p, s = new_vars["params"], new_vars["batch_stats"]
    with torch.no_grad():
        for name in ("conv1", "conv2", "conv3"):
            getattr(tm, name).weight.copy_(ttp._conv_w(p[name]["kernel"]))
        for name in ("bn1", "bn2", "bn3"):
            ttp._load_bn(getattr(tm, name), p[name], s[name])
        for li in range(1, 5):
            for bi in range(2):
                fb = f"layer{li}_block{bi}"
                tb = tm.layers[li - 1][bi]
                tb.conv1.weight.copy_(ttp._conv_w(p[fb]["conv1"]["kernel"]))
                tb.conv2.weight.copy_(ttp._conv_w(p[fb]["conv2"]["kernel"]))
                ttp._load_bn(tb.bn1, p[fb]["bn1"], s[fb]["bn1"])
                ttp._load_bn(tb.bn2, p[fb]["bn2"], s[fb]["bn2"])
                if tb.down is not None:
                    tb.down[0].weight.copy_(
                        ttp._conv_w(p[fb]["downsample_conv"]["kernel"]))
                    ttp._load_bn(tb.down[1], p[fb]["downsample_bn"],
                                 s[fb]["downsample_bn"])
        x = torch.randn(1, 3, 80, 80)
        want = tm(x).numpy()
    got = trunk.apply(new_vars, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
