"""tools/verify_reference.py — the self-closing reference-audit harness.

The real mount has been empty for the entire project (SURVEY.md section 0),
so these tests build a synthetic reference tree in the upstream DenseFusion
layout — source files carrying the expected class names and hyperparameter
constants, plus real `.pth` checkpoints in the upstream naming scheme
(via models/torch_export.py) and an importable `lib/network.py` whose
modules are the upstream-named torch mirrors — and assert the harness:

  * exits 0 with the documented message on an empty mount;
  * on a faithful mount: finds every inventory component, every contract
    hyperparameter, imports the weights with zero unmatched keys, runs
    forward parity against the reference's OWN network.py, and exits 0;
  * on a semantically divergent reference forward: reports parity FAIL
    and exits 2 (the highest-severity outcome).
"""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
from plr2_tpu.models.torch_export import save_reference_checkpoint

_TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "verify_reference.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("verify_reference", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(monkeypatch, capsys, *argv):
    mod = _load_tool()
    monkeypatch.setattr(sys, "argv", ["verify_reference.py"] + list(argv))
    code = mod.main()
    return code, capsys.readouterr().out


_NETWORK_PY = """\
from plr2_tpu.models.torch_upstream import (
    UPoseNet, UPoseNetFeat, UPoseRefineNet)


class PoseNetFeat(UPoseNetFeat):
    pass


class PoseNet(UPoseNet):
    def __init__(self, num_points, num_obj):
        super().__init__(num_points, num_obj)


class PoseRefineNet(UPoseRefineNet):
    def __init__(self, num_points, num_obj):
        super().__init__(num_points, num_obj)
{extra}
"""

# one file per inventory component, carrying the identifying symbols and
# the canonical hyperparameter constants the audit greps for
_TREE = {
    "lib/__init__.py": "",
    "lib/pspnet.py": ("class PSPNet: pass\nclass PSPModule: pass\n"
                      "class PSPUpsample: pass\n"),
    "lib/extractors.py": "class BasicBlock: pass\n",
    "lib/loss.py": "class Loss: pass\ndef loss_calculation(): pass\n",
    "lib/loss_refiner.py": "class Loss_refine: pass\n",
    "lib/transformations.py": ("def quaternion_matrix(q): pass\n"
                               "def quaternion_from_matrix(m): pass\n"),
    "lib/knn/__init__.py": "class KNearestNeighbor: pass\n",
    "datasets/ycb/dataset.py": ("class PoseDataset: pass\n"
                                "factor_depth = 10000\n"),
    "datasets/linemod/dataset.py": ("class PoseDataset: pass\n"
                                    "def ply_vtx(p): pass\n"),
    # upstream-style argparse defaults (multi-line, like the real
    # tools/train.py) plus branch assignments for num_points — exercises
    # BOTH extraction forms of the value-level hyperparameter audit
    "tools/train.py": (
        "import argparse\n"
        "parser = argparse.ArgumentParser()\n"
        "parser.add_argument('--batch_size', type=int, default=8)\n"
        "parser.add_argument('--lr', default=1e-4,\n"
        "                    help='learning rate')\n"
        "parser.add_argument('--lr_rate', default=0.3)\n"
        "parser.add_argument('--w', default=0.015)\n"
        "parser.add_argument('--w_rate', default=0.3)\n"
        "parser.add_argument('--decay_margin', default={decay_margin})\n"
        "parser.add_argument('--refine_margin', default=0.013)\n"
        "parser.add_argument('--noise_trans', default=0.03)\n"
        "parser.add_argument('--iteration', type=int, default=2)\n"
        "opt = parser.parse_args()\n"
        "opt.num_points = 500\n"
        "num_points_ycb = 1000\n"
        "refine_start = False\n"),
    "tools/eval_ycb.py": "posecnn = 'results_PoseCNN_RSS2018'\n",
    "tools/eval_linemod.py": "diameter = []\n",
    "replace_ycb_toolbox/plot_accuracy_keyframe.m": "% VOCap\n",
    "vanilla_segmentation/segnet.py": "class SegNet: pass\n",
    "experiments/scripts/train_ycb.sh": "#!/bin/bash\n# train_ycb\n",
}


def _build_mount(root, extra_forward="", decay_margin="0.016"):
    for rel, content in _TREE.items():
        path = root / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(content.format(decay_margin=decay_margin)
                        if rel == "tools/train.py" else content)
    (root / "lib" / "network.py").write_text(
        _NETWORK_PY.format(extra=extra_forward))

    num_obj = 3
    pose = PoseNet(num_points=16, num_objects=num_obj)
    refine = PoseRefineNet(num_points=16, num_objects=num_obj)
    rng = np.random.default_rng(7)
    pargs = (jnp.zeros((1, 48, 48, 3)), jnp.zeros((1, 16, 3)),
             jnp.zeros((1, 16), jnp.int32), jnp.zeros((1,), jnp.int32))
    rargs = (jnp.zeros((1, 16, 3)), jnp.zeros((1, 16, 32)),
             jnp.zeros((1,), jnp.int32))
    pv = dict(pose.init(jax.random.key(1), *pargs))
    # non-trivial BN stats so parity exercises real normalization
    def _rand(path, x):
        r = rng.normal(size=x.shape).astype(np.float32)
        if any("var" in str(p) for p in path):
            return jnp.asarray(np.abs(r) * 0.5 + 0.3)
        return jnp.asarray(r * 0.3)
    pv["batch_stats"] = jax.tree_util.tree_map_with_path(
        _rand, pv["batch_stats"])
    variables = {"posenet": pv,
                 "refiner": refine.init(jax.random.key(1), *rargs)}
    ckpt_dir = root / "trained_models" / "ycb"
    ckpt_dir.mkdir(parents=True)
    save_reference_checkpoint(
        variables,
        str(ckpt_dir / "pose_model_26_0.012.pth"),
        str(ckpt_dir / "pose_refine_model_69_0.009.pth"))


def test_empty_mount_exits_zero(tmp_path, monkeypatch, capsys):
    empty = tmp_path / "reference"
    empty.mkdir()
    code, out = _run(monkeypatch, capsys, "--reference", str(empty))
    assert code == 0
    assert "EMPTY" in out and "mirror-parity evidence stands" in out


def test_faithful_mount_full_audit_passes(tmp_path, monkeypatch, capsys):
    root = tmp_path / "reference"
    _build_mount(root)
    out_md = tmp_path / "audit.md"
    code, out = _run(monkeypatch, capsys, "--reference", str(root),
                     "--out", str(out_md))
    assert "MISSING" not in out
    assert "NOT FOUND" not in out
    assert "unmatched" not in out
    # both checkpoints parity-checked against the mount's own network.py
    assert out.count("reference-source forward parity **PASS**") == 1
    assert "NumPy-oracle forward parity **PASS**" in out
    assert code == 0, out
    assert out_md.exists() and "## Verdict" in out_md.read_text()


def test_divergent_reference_forward_fails_parity(tmp_path, monkeypatch,
                                                  capsys):
    root = tmp_path / "reference"
    extra = """

class _Divergent(PoseNet):
    pass


def _shifted_forward(self, img, cloud, choose, obj):
    r, t, c, e = UPoseNet.forward(self, img, cloud, choose, obj)
    return r, t + 0.01, c, e


PoseNet.forward = _shifted_forward
"""
    _build_mount(root, extra_forward=extra)
    code, out = _run(monkeypatch, capsys, "--reference", str(root))
    assert "reference-source forward parity **FAIL**" in out
    assert code == 2
    assert "PARITY FAILURE" in out


def test_divergent_hyperparameter_value_fails_audit(tmp_path, monkeypatch,
                                                    capsys):
    """A mount whose decay_margin default is 0.02 must exit 1 even though
    the literal `0.016` appears elsewhere in the tree — exactly the case
    the old presence-regex audit blessed (VERDICT r4 weak #1)."""
    root = tmp_path / "reference"
    _build_mount(root, decay_margin="0.02")
    # plant the canonical digits where the old grep would have found them
    (root / "notes.md").write_text(
        "the paper quotes a 0.016 margin schedule\n")
    code, out = _run(monkeypatch, capsys, "--reference", str(root))
    assert code == 1, out
    assert "DISCREPANCY" in out and "0.02" in out
    assert "decay_margin" in out
    # every other contract value still audits clean
    assert out.count("DISCREPANCY") == 1


def test_sparse_mount_reports_missing_components(tmp_path, monkeypatch,
                                                 capsys):
    root = tmp_path / "reference"
    (root / "lib").mkdir(parents=True)
    (root / "lib" / "pspnet.py").write_text("class PSPNet: pass\n")
    code, out = _run(monkeypatch, capsys, "--reference", str(root))
    assert code == 1
    assert "MISSING" in out and "discrepancies found" in out
