"""Export plr2_tpu weights as reference (PyTorch DenseFusion-layout)
checkpoints — the inverse of `torch_import.py`.

Lets a user train on TPU here and hand the resulting `pose_model.pth` /
`pose_refine_model.pth` straight to the reference's torch eval/serving
stack (upstream lib/network.py module tree, SURVEY.md section 2 #2-#5).
Key layout emitted is the exact state_dict of the upstream modules:

  cnn.model.feats.{conv,bn}{1..3}.*            (3-conv dilated-resnet stem)
  cnn.model.feats.layer{1..4}.{0,1}.*          (BasicBlocks + downsample.{0,1})
  cnn.model.psp.stages.{i}.1.weight            (Sequential(AdaptiveAvgPool, Conv))
  cnn.model.psp.bottleneck.{weight,bias}
  cnn.model.up_{1..3}.conv.{1,2}.*             (Sequential(Upsample, Conv, PReLU))
  cnn.model.final.0.{weight,bias}              (Sequential(Conv2d, LogSoftmax))
  feat.{conv1,conv2,e_conv1,e_conv2,conv5,conv6}.*   (Conv1d)
  conv{1..4}_{r,t,c}.*                         (PoseNet heads, Conv1d)
  conv{1..3}_{r,t}.*                           (RefineNet heads, Linear)

Tensor layouts are converted back: HWIO -> OIHW (Conv2d), Dense (in, out)
-> Conv1d (out, in, 1) / Linear (out, in); BN scale/bias + batch_stats
mean/var -> weight/bias/running_mean/running_var, plus the int64
`num_batches_tracked` buffer torch BatchNorm state dicts carry (emitted
as 0 so `load_state_dict(strict=True)` on real torch modules succeeds).

Round-trip pinned by test: export -> import_posenet_state_dict recovers
the identical variable tree with zero unmatched keys, and the exported
dict strict-loads into torch modules with the authentic upstream
attribute names (tests/test_torch_import.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv2d(k) -> np.ndarray:  # HWIO -> OIHW
    return np.ascontiguousarray(_np(k).transpose(3, 2, 0, 1))


def _conv1d(k) -> np.ndarray:  # Dense (in, out) -> (out, in, 1)
    return np.ascontiguousarray(_np(k).T[..., None])


def _linear(k) -> np.ndarray:  # Dense (in, out) -> (out, in)
    return np.ascontiguousarray(_np(k).T)


def _bn(prefix: str, params: Dict, stats: Dict, out: Dict) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _feats(fe: Dict, se: Dict, out: Dict) -> None:
    pre = "cnn.model.feats"
    for i in (1, 2, 3):
        out[f"{pre}.conv{i}.weight"] = _conv2d(fe[f"conv{i}"]["kernel"])
        _bn(f"{pre}.bn{i}", fe[f"bn{i}"], se[f"bn{i}"], out)
    for li in range(1, 5):
        for bi in range(2):
            fb, sb = fe[f"layer{li}_block{bi}"], se[f"layer{li}_block{bi}"]
            base = f"{pre}.layer{li}.{bi}"
            out[f"{base}.conv1.weight"] = _conv2d(fb["conv1"]["kernel"])
            out[f"{base}.conv2.weight"] = _conv2d(fb["conv2"]["kernel"])
            _bn(f"{base}.bn1", fb["bn1"], sb["bn1"], out)
            _bn(f"{base}.bn2", fb["bn2"], sb["bn2"], out)
            if "downsample_conv" in fb:
                out[f"{base}.downsample.0.weight"] = _conv2d(
                    fb["downsample_conv"]["kernel"])
                _bn(f"{base}.downsample.1", fb["downsample_bn"],
                    sb["downsample_bn"], out)


def export_posenet_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax PoseNet variables ({params, batch_stats}) -> upstream state_dict."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    _feats(params["cnn"]["feats"], stats["cnn"]["feats"], out)

    psp = params["cnn"]["psp"]
    for i in range(4):
        out[f"cnn.model.psp.stages.{i}.1.weight"] = _conv2d(
            psp[f"stage{i}_conv"]["kernel"])
    out["cnn.model.psp.bottleneck.weight"] = _conv2d(psp["bottleneck"]["kernel"])
    out["cnn.model.psp.bottleneck.bias"] = _np(psp["bottleneck"]["bias"])

    for name in ("up_1", "up_2", "up_3"):
        up = params["cnn"][name]
        out[f"cnn.model.{name}.conv.1.weight"] = _conv2d(up["conv"]["kernel"])
        out[f"cnn.model.{name}.conv.1.bias"] = _np(up["conv"]["bias"])
        # torch PReLU stores a shape-(1,) parameter
        out[f"cnn.model.{name}.conv.2.weight"] = _np(
            up["prelu_alpha"]).reshape(1)

    out["cnn.model.final.0.weight"] = _conv2d(params["cnn"]["final"]["kernel"])
    out["cnn.model.final.0.bias"] = _np(params["cnn"]["final"]["bias"])

    for name in ("conv1", "e_conv1", "conv2", "e_conv2", "conv5", "conv6"):
        out[f"feat.{name}.weight"] = _conv1d(params["feat"][name]["kernel"])
        out[f"feat.{name}.bias"] = _np(params["feat"][name]["bias"])
    for tag in ("r", "t", "c"):
        for i in range(1, 5):
            lp = params[f"conv{i}_{tag}"]
            out[f"conv{i}_{tag}.weight"] = _conv1d(lp["kernel"])
            out[f"conv{i}_{tag}.bias"] = _np(lp["bias"])
    return out


def export_refinenet_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax PoseRefineNet variables ({params}) -> upstream state_dict
    (Conv1d feature trunk, Linear heads)."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for name in ("conv1", "e_conv1", "conv2", "e_conv2", "conv5", "conv6"):
        out[f"feat.{name}.weight"] = _conv1d(params["feat"][name]["kernel"])
        out[f"feat.{name}.bias"] = _np(params["feat"][name]["bias"])
    for tag in ("r", "t"):
        for i in range(1, 4):
            lp = params[f"conv{i}_{tag}"]
            out[f"conv{i}_{tag}.weight"] = _linear(lp["kernel"])
            out[f"conv{i}_{tag}.bias"] = _np(lp["bias"])
    return out


def save_reference_checkpoint(variables: Dict, posenet_path: str,
                              refinenet_path: str = "") -> None:
    """Write torch-loadable .pth file(s) from a pipeline variables tree
    ({posenet: ..., refiner: ...}) — the inverse of
    torch_import.load_reference_checkpoint."""
    import torch

    def _save(sd: Dict[str, np.ndarray], path: str) -> None:
        # np.array forces a writable copy — jax-backed buffers are read-only
        torch.save({k: torch.from_numpy(np.array(v))
                    for k, v in sd.items()}, path)

    _save(export_posenet_state_dict(variables["posenet"]), posenet_path)
    if refinenet_path:
        _save(export_refinenet_state_dict(variables["refiner"]),
              refinenet_path)
