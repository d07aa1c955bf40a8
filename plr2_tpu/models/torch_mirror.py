"""PyTorch mirror of the PoseNet/PoseRefineNet forward passes.

Written from the documented architecture spec (SURVEY.md section 2 #2-#5,
upstream lib/network.py / lib/pspnet.py layout — mount empty, VERIFY).
Used two ways:

* tests/test_torch_parity.py transplants flax weights into the mirror and
  pins the full forward bit-for-bit (conv padding/dilation, BN eval
  statistics, adaptive pooling, bilinear upsampling, PReLU, head
  reshaping);
* tools/verify_reference.py falls back to mirror-vs-flax parity on REAL
  reference .pth weights when the reference's own source tree cannot be
  imported (e.g. its CUDA knn extension fails to build on this host).

Requires torch; import only where torch availability is guaranteed or
guarded (the plr2_tpu package does not import this module by default).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, dilation,
                                dilation, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, dilation, dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.down = None
        if downsample:
            self.down = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class TResNet18(tnn.Module):
    """Deep-stem dilated ResNet-18 (the pspnet-pytorch ModifiedResnet)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3 = tnn.Conv2d(64, 128, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(128)
        specs = [(128, 64, 1, 1), (64, 128, 2, 1),
                 (128, 256, 1, 2), (256, 512, 1, 4)]
        layers = []
        for inp, planes, stride, dil in specs:
            blocks = [TBasicBlock(inp, planes, stride, dil,
                                  downsample=(stride != 1 or inp != planes)),
                      TBasicBlock(planes, planes, 1, dil)]
            layers.append(tnn.Sequential(*blocks))
        self.layers = tnn.ModuleList(layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for l in self.layers:
            x = l(x)
        return x


class TPSPNet(tnn.Module):
    def __init__(self, emb_dim=32, sizes=(1, 2, 3, 6)):
        super().__init__()
        self.feats = TResNet18()
        self.sizes = sizes
        self.stages = tnn.ModuleList(
            [tnn.Conv2d(512, 512, 1, bias=False) for _ in sizes])
        self.bottleneck = tnn.Conv2d(512 * (len(sizes) + 1), 1024, 1)
        self.up = tnn.ModuleList([tnn.Conv2d(1024, 256, 3, padding=1),
                                  tnn.Conv2d(256, 64, 3, padding=1),
                                  tnn.Conv2d(64, 64, 3, padding=1)])
        self.prelus = tnn.ParameterList(
            [tnn.Parameter(torch.tensor(0.25)) for _ in range(3)])
        self.final = tnn.Conv2d(64, emb_dim, 1)

    def forward(self, x):
        f = self.feats(x)
        h, w = f.shape[2:]
        priors = [F.interpolate(stage(F.adaptive_avg_pool2d(f, s)), (h, w),
                                mode="bilinear", align_corners=False)
                  for stage, s in zip(self.stages, self.sizes)] + [f]
        p = F.relu(self.bottleneck(torch.cat(priors, 1)))
        for conv, alpha in zip(self.up, self.prelus):
            p = F.interpolate(p, scale_factor=2, mode="bilinear",
                              align_corners=False)
            p = conv(p)
            p = torch.where(p >= 0, p, alpha * p)
        return F.log_softmax(self.final(p), dim=1)


class TPoseNet(tnn.Module):
    def __init__(self, num_obj):
        super().__init__()
        self.num_obj = num_obj
        self.cnn = TPSPNet()
        self.f_conv1 = tnn.Linear(3, 64)
        self.f_e1 = tnn.Linear(32, 64)
        self.f_conv2 = tnn.Linear(64, 128)
        self.f_e2 = tnn.Linear(64, 128)
        self.f_conv5 = tnn.Linear(256, 512)
        self.f_conv6 = tnn.Linear(512, 1024)
        for tag, out in (("r", 4), ("t", 3), ("c", 1)):
            setattr(self, f"h1_{tag}", tnn.Linear(1408, 640))
            setattr(self, f"h2_{tag}", tnn.Linear(640, 256))
            setattr(self, f"h3_{tag}", tnn.Linear(256, 128))
            setattr(self, f"h4_{tag}", tnn.Linear(128, num_obj * out))

    def forward(self, img, cloud, choose, obj):
        emb_map = self.cnn(img)                      # (B, 32, H, W)
        b, c = emb_map.shape[:2]
        flat = emb_map.reshape(b, c, -1)
        emb = torch.gather(flat, 2,
                           choose.unsqueeze(1).expand(-1, c, -1))
        emb = emb.transpose(1, 2)                    # (B, N, 32)

        x = F.relu(self.f_conv1(cloud))
        e = F.relu(self.f_e1(emb))
        f1 = torch.cat([x, e], -1)
        x = F.relu(self.f_conv2(x))
        e = F.relu(self.f_e2(e))
        f2 = torch.cat([x, e], -1)
        y = F.relu(self.f_conv5(f2))
        y = F.relu(self.f_conv6(y))
        glob = y.mean(1, keepdim=True).expand(-1, y.shape[1], -1)
        feat = torch.cat([f1, f2, glob], -1)         # (B, N, 1408)

        outs = {}
        for tag, od in (("r", 4), ("t", 3), ("c", 1)):
            h = F.relu(getattr(self, f"h1_{tag}")(feat))
            h = F.relu(getattr(self, f"h2_{tag}")(h))
            h = F.relu(getattr(self, f"h3_{tag}")(h))
            h = getattr(self, f"h4_{tag}")(h)
            h = h.reshape(b, h.shape[1], self.num_obj, od)
            sel = obj.view(b, 1, 1, 1).expand(b, h.shape[1], 1, od)
            outs[tag] = torch.gather(h, 2, sel)[:, :, 0, :]
        return outs["r"], outs["t"], torch.sigmoid(outs["c"]), emb


# ---------------- flax -> mirror weight transplant ----------------

def _conv_w(p):  # HWIO -> OIHW
    return torch.from_numpy(np.asarray(p).transpose(3, 2, 0, 1).copy())


def _lin_w(p):  # (in, out) -> (out, in)
    return torch.from_numpy(np.asarray(p).T.copy())


def _load_bn(tbn, fbn_params, fbn_stats):
    tbn.weight.data = torch.from_numpy(np.asarray(fbn_params["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(fbn_params["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(
        np.asarray(fbn_stats["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(
        np.asarray(fbn_stats["var"]).copy())


def transplant_posenet(tm: TPoseNet, variables):
    """Copy flax PoseNet variables into the torch mirror in place."""
    params = variables["params"]
    stats = variables["batch_stats"]
    cnn_p, cnn_s = params["cnn"], stats["cnn"]
    fe, se = cnn_p["feats"], cnn_s["feats"]

    for i in (1, 2, 3):
        getattr(tm.cnn.feats, f"conv{i}").weight.data = _conv_w(
            fe[f"conv{i}"]["kernel"])
        _load_bn(getattr(tm.cnn.feats, f"bn{i}"), fe[f"bn{i}"], se[f"bn{i}"])

    for li in range(4):
        for bi in range(2):
            fb = fe[f"layer{li + 1}_block{bi}"]
            sb = se[f"layer{li + 1}_block{bi}"]
            tb = tm.cnn.feats.layers[li][bi]
            tb.conv1.weight.data = _conv_w(fb["conv1"]["kernel"])
            tb.conv2.weight.data = _conv_w(fb["conv2"]["kernel"])
            _load_bn(tb.bn1, fb["bn1"], sb["bn1"])
            _load_bn(tb.bn2, fb["bn2"], sb["bn2"])
            if tb.down is not None:
                tb.down[0].weight.data = _conv_w(
                    fb["downsample_conv"]["kernel"])
                _load_bn(tb.down[1], fb["downsample_bn"], sb["downsample_bn"])

    psp = cnn_p["psp"]
    for i in range(4):
        tm.cnn.stages[i].weight.data = _conv_w(psp[f"stage{i}_conv"]["kernel"])
    tm.cnn.bottleneck.weight.data = _conv_w(psp["bottleneck"]["kernel"])
    tm.cnn.bottleneck.bias.data = torch.from_numpy(
        np.asarray(psp["bottleneck"]["bias"]).copy())
    for i, name in enumerate(("up_1", "up_2", "up_3")):
        up = cnn_p[name]
        tm.cnn.up[i].weight.data = _conv_w(up["conv"]["kernel"])
        tm.cnn.up[i].bias.data = torch.from_numpy(
            np.asarray(up["conv"]["bias"]).copy())
        tm.cnn.prelus[i].data = torch.tensor(float(up["prelu_alpha"]))
    tm.cnn.final.weight.data = _conv_w(cnn_p["final"]["kernel"])
    tm.cnn.final.bias.data = torch.from_numpy(
        np.asarray(cnn_p["final"]["bias"]).copy())

    feat = params["feat"]
    for tname, fname in (("f_conv1", "conv1"), ("f_e1", "e_conv1"),
                         ("f_conv2", "conv2"), ("f_e2", "e_conv2"),
                         ("f_conv5", "conv5"), ("f_conv6", "conv6")):
        lin = getattr(tm, tname)
        lin.weight.data = _lin_w(feat[fname]["kernel"])
        lin.bias.data = torch.from_numpy(
            np.asarray(feat[fname]["bias"]).copy())

    for tag in ("r", "t", "c"):
        for i in range(1, 5):
            lin = getattr(tm, f"h{i}_{tag}")
            lp = params[f"conv{i}_{tag}"]
            lin.weight.data = _lin_w(lp["kernel"])
            lin.bias.data = torch.from_numpy(np.asarray(lp["bias"]).copy())
