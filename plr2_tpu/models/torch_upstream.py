"""Upstream-named PyTorch modules (lib/extractors.py / lib/pspnet.py /
lib/network.py attribute layout [upstream, mount empty — VERIFY]).

torch's own state_dict key generation over these modules defines the
exact on-disk naming scheme that models/torch_export.py must emit and
models/torch_import.py must consume. Shared by tests/test_torch_import.py
(strict-load + forward parity of exported checkpoints) and
tests/test_verify_reference.py (a synthetic reference mount that exercises
tools/verify_reference.py's real-source parity path).

Requires torch; not imported by the plr2_tpu package by default.
"""

import torch
import torch.nn as tnn
import torch.nn.functional as F

class UBlock(tnn.Module):
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


class UResNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3 = tnn.Conv2d(64, 128, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(128)
        self.layer1 = tnn.Sequential(UBlock(128, 64, down=True),
                                     UBlock(64, 64))
        self.layer2 = tnn.Sequential(UBlock(64, 128, stride=2, down=True),
                                     UBlock(128, 128))
        self.layer3 = tnn.Sequential(UBlock(128, 256, dil=2, down=True),
                                     UBlock(256, 256, dil=2))
        self.layer4 = tnn.Sequential(UBlock(256, 512, dil=4, down=True),
                                     UBlock(512, 512, dil=4))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x


class UPSPModule(tnn.Module):
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


class UPSPUpsample(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            tnn.Conv2d(cin, cout, 3, padding=1),
            tnn.PReLU())

    def forward(self, x):
        return self.conv(x)


class UPSPNet(tnn.Module):
    def __init__(self, emb_dim=32):
        super().__init__()
        self.feats = UResNet()
        self.psp = UPSPModule()
        self.up_1 = UPSPUpsample(1024, 256)
        self.up_2 = UPSPUpsample(256, 64)
        self.up_3 = UPSPUpsample(64, 64)
        self.final = tnn.Sequential(tnn.Conv2d(64, emb_dim, 1),
                                    tnn.LogSoftmax(dim=1))

    def forward(self, x):
        p = self.psp(self.feats(x))
        return self.final(self.up_3(self.up_2(self.up_1(p))))


class UModifiedResnet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.model = UPSPNet()

    def forward(self, x):
        return self.model(x)


class UPoseNetFeat(tnn.Module):
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


class UPoseNet(tnn.Module):
    def __init__(self, num_points, num_obj):
        super().__init__()
        self.num_obj = num_obj
        self.cnn = UModifiedResnet()
        self.feat = UPoseNetFeat(num_points)
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


class UPoseRefineNetFeat(tnn.Module):
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


class UPoseRefineNet(tnn.Module):
    def __init__(self, num_points, num_obj):
        super().__init__()
        self.num_obj = num_obj
        self.feat = UPoseRefineNetFeat(num_points)
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


