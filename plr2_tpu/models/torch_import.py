"""Import reference (PyTorch DenseFusion-layout) checkpoints into plr2_tpu.

Lets a user of the reference bring their trained `pose_model_*.pth` /
`pose_refine_model_*.pth` weights straight into this framework. The name
mapping targets the upstream lib/network.py module tree (SURVEY.md
section 2 #2-#5):

  cnn.model(.module)?.feats.*        -> params/cnn/feats/*   (torch resnet)
  cnn.model(.module)?.psp.*          -> params/cnn/psp/*
  cnn.model(.module)?.up_{1,2,3}.*   -> params/cnn/up_{1,2,3}/*
  cnn.model(.module)?.final.*        -> params/cnn/final
  feat.conv1/e_conv1/... (Conv1d)    -> params/feat/*        (Dense)
  conv{1..4}_{r,t,c} (Conv1d)        -> params/conv{i}_{r,t,c}

Tensor layout conversions: Conv2d OIHW -> HWIO; Conv1d (out, in, 1) ->
Dense (in, out); Linear (out, in) -> Dense (in, out); BatchNorm
weight/bias/running_mean/running_var -> scale/bias + batch_stats mean/var.

Unmatched source keys are returned so callers can assert completeness
against their exact checkpoint (the reference repo may wrap modules in
DataParallel — 'module.' prefixes are stripped).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _set(tree: Dict, path: List[str], value: np.ndarray) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    if tuple(node[path[-1]].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{node[path[-1]].shape} vs {value.shape}")
    node[path[-1]] = value
    return True


def _conv2d(w: np.ndarray) -> np.ndarray:  # OIHW -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv1d(w: np.ndarray) -> np.ndarray:  # (out, in, 1) -> (in, out)
    return np.ascontiguousarray(w[..., 0].T)


def _linear(w: np.ndarray) -> np.ndarray:  # (out, in) -> (in, out)
    return np.ascontiguousarray(w.T)


def _map_resnet_key(parts: List[str]) -> List[str] | None:
    """torch extractors.ResNet names -> our DilatedResNet18 names."""
    head = parts[0]
    if head in ("conv1", "conv2", "conv3"):
        return [head, "kernel"]
    if head in ("bn1", "bn2", "bn3"):
        return [head, parts[1]]
    if head.startswith("layer"):
        li = head[5:]
        bi, sub = parts[1], parts[2]
        base = f"layer{li}_block{bi}"
        if sub == "downsample":
            which = parts[3]  # 0 = conv, 1 = bn
            leaf = parts[4]
            if which == "0":
                return [base, "downsample_conv", "kernel"]
            return [base, "downsample_bn", leaf]
        if sub in ("conv1", "conv2"):
            return [base, sub, "kernel"]
        if sub in ("bn1", "bn2"):
            return [base, sub, parts[3]]
    return None


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def import_posenet_state_dict(state_dict: Dict[str, "object"],
                              variables: Dict) -> Tuple[Dict, List[str]]:
    """Merge a reference PoseNet state_dict into a flax variables tree.

    Returns (updated variables, list of unmatched source keys)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    unmatched: List[str] = []

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue  # torch BN bookkeeping buffer; no flax counterpart
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = [p for p in key.split(".") if p != "module"]
        ok = False

        if parts[0] == "cnn":
            sub = parts[2:] if parts[1] == "model" else parts[1:]
            if sub[0] == "feats":
                leaf = sub[1:]
                mapped = _map_resnet_key(leaf)
                if mapped is not None:
                    torch_leaf = leaf[-1]
                    if torch_leaf == "weight" and mapped[-1] == "kernel":
                        ok = _set(params, ["cnn", "feats"] + mapped, _conv2d(v))
                    elif torch_leaf in _BN_PARAM and mapped[-1] == torch_leaf:
                        mapped[-1] = _BN_PARAM[torch_leaf]
                        ok = _set(params, ["cnn", "feats"] + mapped, v)
                    elif torch_leaf in _BN_STAT:
                        mapped[-1] = _BN_STAT[torch_leaf]
                        ok = _set(stats, ["cnn", "feats"] + mapped, v)
            elif sub[0] == "psp":
                if sub[1] == "stages":
                    ok = _set(params, ["cnn", "psp", f"stage{sub[2]}_conv",
                                       "kernel"], _conv2d(v))
                elif sub[1] == "bottleneck":
                    leaf = "kernel" if sub[-1] == "weight" else "bias"
                    ok = _set(params, ["cnn", "psp", "bottleneck", leaf],
                              _conv2d(v) if leaf == "kernel" else v)
            elif sub[0] in ("up_1", "up_2", "up_3"):
                # upstream PSPUpsample.conv = Sequential(Upsample, Conv2d, PReLU)
                if sub[-1] == "weight" and v.ndim == 4:
                    ok = _set(params, ["cnn", sub[0], "conv", "kernel"],
                              _conv2d(v))
                elif v.ndim <= 1 and "PReLU" not in key and sub[-1] == "bias":
                    ok = _set(params, ["cnn", sub[0], "conv", "bias"], v)
                elif v.size == 1:  # PReLU alpha
                    ok = _set(params, ["cnn", sub[0], "prelu_alpha"],
                              v.reshape(()))
            elif sub[0] == "final":
                leaf = "kernel" if sub[-1] == "weight" else "bias"
                ok = _set(params, ["cnn", "final", leaf],
                          _conv2d(v) if leaf == "kernel" else v)
        elif parts[0] == "feat":
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            ok = _set(params, ["feat", parts[1], leaf],
                      _conv1d(v) if leaf == "kernel" else v)
        elif parts[0].startswith("conv") and "_" in parts[0]:
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            ok = _set(params, [parts[0], leaf],
                      _conv1d(v) if leaf == "kernel" else v)

        if not ok:
            unmatched.append(key)
    return variables, unmatched


def import_refinenet_state_dict(state_dict: Dict[str, "object"],
                                variables: Dict) -> Tuple[Dict, List[str]]:
    """Merge a reference PoseRefineNet state_dict (feat.* Conv1d trunk +
    conv{1..3}_{r,t} Linear heads)."""
    params = variables["params"]
    unmatched: List[str] = []
    for key, val in state_dict.items():
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = [p for p in key.split(".") if p != "module"]
        ok = False
        if parts[0] == "feat":
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            ok = _set(params, ["feat", parts[1], leaf],
                      _conv1d(v) if leaf == "kernel" else v)
        elif parts[0].startswith("conv") and "_" in parts[0]:
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            # upstream refiner heads are Linear, not Conv1d
            ok = _set(params, [parts[0], leaf],
                      _linear(v) if leaf == "kernel" else v)
        if not ok:
            unmatched.append(key)
    return variables, unmatched


def _bn_partner(bn_path: Tuple[str, ...]) -> Tuple[str, ...]:
    """The conv a BatchNorm normalizes: bnX -> convX, downsample_bn ->
    downsample_conv (same prefix)."""
    *prefix, bn = bn_path
    if bn == "downsample_bn":
        return tuple(prefix) + ("downsample_conv",)
    return tuple(prefix) + ("conv" + bn[2:],)


def import_torchvision_resnet18(state_dict: Dict[str, "object"],
                                variables: Dict
                                ) -> Tuple[Dict, List[str], List[str]]:
    """Partial ImageNet-pretrained load: a torchvision `resnet18`
    state_dict into the PoseNet's deep-stem DilatedResNet18 trunk
    (upstream lib/extractors.py loads pretrained resnet weights before
    training [upstream, mount empty — VERIFY]; the deep 3-conv stem
    follows the public pspnet-pytorch recipe, for which torchvision has
    no exact counterpart).

    Structural differences mean a partial load by design:
      * the stem (torchvision: one conv7x7; here: three conv3x3) and
        layer1 block0's input width (64 vs 128, plus our extra
        downsample) have NO torchvision counterpart — those tensors keep
        their initialization;
      * every shape-compatible conv of layer1-4 (incl. downsamples)
        imports — that is layers 2-4 completely plus layer1's remaining
        convs, the bulk of the trunk's capacity;
      * a BatchNorm (params AND running stats) imports only when the conv
        it normalizes imported — ImageNet statistics calibrated against a
        randomly-initialized conv would hurt, not help.

    Operates on the POSENET variables tree. Returns
    (variables, imported source keys, skipped source keys)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    imported: List[str] = []
    skipped: List[str] = []
    conv_ok = set()
    bn_items = []

    for key, val in state_dict.items():
        if key.endswith("num_batches_tracked") or key.startswith("fc."):
            skipped.append(key)
            continue
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        mapped = _map_resnet_key(key.split("."))
        if mapped is None:
            skipped.append(key)
            continue
        if mapped[-1] == "kernel":
            try:
                ok = _set(params, ["cnn", "feats"] + mapped, _conv2d(v))
            except ValueError:  # shape mismatch: stem / layer1 block0
                ok = False
            (imported if ok else skipped).append(key)
            if ok:
                conv_ok.add(tuple(mapped[:-1]))
        else:
            bn_items.append((key, v, mapped))

    for key, v, mapped in bn_items:
        bn_path = tuple(mapped[:-1])
        if _bn_partner(bn_path) not in conv_ok:
            skipped.append(key)
            continue
        leaf = key.split(".")[-1]
        try:
            if leaf in _BN_PARAM:
                ok = _set(params,
                          ["cnn", "feats"] + list(bn_path) + [_BN_PARAM[leaf]],
                          v)
            elif leaf in _BN_STAT:
                ok = _set(stats,
                          ["cnn", "feats"] + list(bn_path) + [_BN_STAT[leaf]],
                          v)
            else:
                ok = False
        except ValueError:
            ok = False
        (imported if ok else skipped).append(key)
    return variables, imported, skipped


def load_pretrained_trunk(path: str, variables: Dict
                          ) -> Tuple[Dict, List[str], List[str]]:
    """Load a torchvision resnet18 .pth into the pipeline variables tree's
    PoseNet trunk (tools/train.py --pretrained_trunk). Accepts either a
    bare state_dict or a saved module."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    variables["posenet"], imported, skipped = import_torchvision_resnet18(
        sd, variables["posenet"])
    return variables, imported, skipped


def load_reference_checkpoint(posenet_path: str, variables: Dict,
                              refinenet_path: str = "") -> Dict:
    """Load .pth file(s) (torch CPU) into a pipeline variables tree."""
    import torch

    sd = torch.load(posenet_path, map_location="cpu")
    variables["posenet"], missed = import_posenet_state_dict(
        sd, variables["posenet"])
    if missed:
        raise ValueError(f"unmatched PoseNet keys: {missed[:10]}"
                         f"{'...' if len(missed) > 10 else ''}")
    if refinenet_path:
        sd = torch.load(refinenet_path, map_location="cpu")
        variables["refiner"], missed = import_refinenet_state_dict(
            sd, variables["refiner"])
        if missed:
            raise ValueError(f"unmatched RefineNet keys: {missed[:10]}")
    return variables
