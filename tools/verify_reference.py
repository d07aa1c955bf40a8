#!/usr/bin/env python
"""Reference-verification harness (VERDICT r3 item 1).

The reference mount `/root/reference/` has been EMPTY for the entire
project (SURVEY.md section 0), so every fidelity claim rests on the
in-repo torch mirror written from the documented spec. This tool makes
that trust gap self-closing: run it at session start (CLAUDE.md), and the
moment the mount populates it

  1. audits SURVEY.md section 2's component inventory against the real
     tree (expected upstream paths, class/symbol definitions), emitting
     file:line evidence and corrections;
  2. audits the hyperparameter contract (decay 0.016, refine switch
     0.013, w=0.015, noise_trans=0.03, lr=1e-4, 500/1000 points, ...)
     against the reference source;
  3. if reference `.pth` weights are present, imports them through
     `models/torch_import.py` and runs FULL forward parity:
       a. against the reference's own `lib/network.py` modules when that
          tree imports on this host (torch CPU), or
       b. against an independent NumPy re-execution of the architecture
          (fallback when the reference source cannot be imported, e.g.
          its CUDA knn extension).

Exit codes: 0 = mount empty, or populated with no discrepancies;
1 = inventory/hyperparameter discrepancies (survey corrections needed);
2 = weight-level forward parity FAILED (bit-fidelity broken — highest
severity).

Usage:
  python tools/verify_reference.py [--reference /root/reference]
      [--out REFERENCE_AUDIT.md] [--max-pth 4]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_EXT = {".py", ".cu", ".h", ".hpp", ".cpp", ".c", ".m", ".sh", ".yml",
            ".yaml", ".json", ".txt", ".md", ".cfg", ".toml"}
MAX_SCAN_BYTES = 2 * 1024 * 1024

# SURVEY.md section 2 inventory: (component, [expected relpaths],
# [symbol regexes that identify it], required?). `required` components
# missing from a populated mount are discrepancies; optional ones are
# informational (the [C]-tier PLR2 extras the survey could not see).
INVENTORY = [
    ("1 KNN extension", ["lib/knn"],
     [r"class\s+KNearestNeighbor", r"knn\w*_cuda", r"THCudaTensor"], True),
    ("2 PSPNet encoder", ["lib/pspnet.py", "lib/extractors.py"],
     [r"class\s+PSPNet", r"class\s+PSPModule", r"class\s+PSPUpsample"], True),
    ("3/4 PoseNet", ["lib/network.py"],
     [r"class\s+PoseNet\b", r"class\s+PoseNetFeat"], True),
    ("5 PoseRefineNet", ["lib/network.py"],
     [r"class\s+PoseRefineNet"], True),
    ("6 ADD(-S) loss", ["lib/loss.py"],
     [r"class\s+Loss\b", r"def\s+loss_calculation"], True),
    ("7 Refiner loss", ["lib/loss_refiner.py"],
     [r"class\s+Loss_refine"], True),
    ("8 YCB dataset", ["datasets/ycb/dataset.py"],
     [r"class\s+PoseDataset", r"data_syn|factor_depth"], True),
    ("9 LineMOD dataset", ["datasets/linemod/dataset.py"],
     [r"class\s+PoseDataset", r"def\s+ply_vtx|models_info"], True),
    ("10 Transform utils", ["lib/transformations.py"],
     [r"def\s+quaternion_matrix", r"def\s+quaternion_from_matrix"], True),
    ("11 Train driver", ["tools/train.py", "train.py"],
     [r"refine_margin|decay_margin|refine_start"], True),
    ("12 YCB eval driver", ["tools/eval_ycb.py"],
     [r"results_PoseCNN|posecnn|PoseCNN"], True),
    ("13 LineMOD eval driver", ["tools/eval_linemod.py"],
     [r"diameter"], True),
    ("14 ADD-S AUC toolbox", ["replace_ycb_toolbox"],
     [r"plot_accuracy|evaluate_poses|VOCap"], True),
    ("15 Vanilla segmentation", ["vanilla_segmentation"],
     [r"class\s+SegNet|segnet"], True),
    ("16 Experiment scripts", ["experiments/scripts"],
     [r"train_ycb|train_linemod"], True),
    ("17 PLR2 orchestration [C]", ["cfg", "src", "conf"],
     [r"pytorch_lightning|LightningModule|yaml\.safe_load|hydra"], False),
]

# The behavior contract (SURVEY section 5.6 / plr2_tpu/config.py). Each
# entry: (label, [symbols to extract], our value). The audit extracts the
# ACTUAL numeric values the reference binds to each symbol — argparse
# defaults (`add_argument('--sym', ..., default=V)`) and literal
# assignments / keyword bindings (`sym = V`, `opt.sym = V`) — and
# compares numerically. A symbol bound only to OTHER values is a
# DISCREPANCY (exit 1); presence of the digits elsewhere in the tree no
# longer counts (VERDICT r4 weak #1: the old presence-regex audit would
# bless a mount whose decay_margin was 0.02 as long as `0.016` appeared
# anywhere). Membership semantics: the expected value must be AMONG the
# bindings — upstream binds num_points to both 500 (LineMOD) and 1000
# (YCB), and unrelated numeric bindings of a generic symbol (`w`) are
# tolerated as long as ours appears.
HYPERPARAMS = [
    ("decay_margin", ["decay_margin"], 0.016),
    ("refine_margin", ["refine_margin"], 0.013),
    ("confidence weight w", ["w"], 0.015),
    ("noise_trans", ["noise_trans"], 0.03),
    ("lr", ["lr"], 1e-4),
    ("lr decay rate", ["lr_rate"], 0.3),
    ("w decay rate", ["w_rate"], 0.3),
    ("num_points LineMOD", ["num_points", "num_pt"], 500),
    ("num_points YCB", ["num_points", "num_points_ycb", "num_pt"], 1000),
    ("refine iterations", ["iteration"], 2),
    ("batch_size", ["batch_size"], 8),
]

_NUM_RX = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def _parse_num(tok):
    try:
        return float(tok)
    except ValueError:
        return None


def extract_values(root, files, sym):
    """All numeric values the tree binds to `sym`, as (value, file:line).

    Two binding forms: argparse defaults (the upstream train.py style —
    `parser.add_argument('--decay_margin', default=0.016, ...)`, possibly
    spanning lines) and plain assignments / keyword args
    (`opt.num_points = 1000`, `w = 0.015`)."""
    argparse_rx = re.compile(
        r"add_argument\(\s*['\"]--?" + re.escape(sym) + r"['\"][^)]{0,400}?"
        r"default\s*=\s*(" + _NUM_RX + r")", re.S)
    assign_rx = re.compile(
        r"\b" + re.escape(sym) + r"\s*=\s*(" + _NUM_RX + r")(?![\w.])")
    out = []
    for rel in files:
        if os.path.splitext(rel)[1].lower() not in SCAN_EXT:
            continue
        path = os.path.join(root, rel)
        try:
            if os.path.getsize(path) > MAX_SCAN_BYTES:
                continue
            with open(path, "r", errors="replace") as fh:
                text = fh.read()
        except OSError:
            continue
        for m in argparse_rx.finditer(text):
            v = _parse_num(m.group(1))
            if v is not None:
                line = text.count("\n", 0, m.start()) + 1
                out.append((v, f"{rel}:{line}"))
        for m in assign_rx.finditer(text):
            # skip the default= inside add_argument already captured above
            v = _parse_num(m.group(1))
            if v is not None:
                line = text.count("\n", 0, m.start()) + 1
                out.append((v, f"{rel}:{line}"))
    return out


def list_files(root):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in (".git", "__pycache__")]
        for f in filenames:
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def grep_tree(root, files, pattern, max_hits=3):
    """file:line hits of `pattern` across scannable files."""
    rx = re.compile(pattern)
    hits = []
    for rel in files:
        if os.path.splitext(rel)[1].lower() not in SCAN_EXT:
            continue
        path = os.path.join(root, rel)
        try:
            if os.path.getsize(path) > MAX_SCAN_BYTES:
                continue
            with open(path, "r", errors="replace") as fh:
                for i, line in enumerate(fh, 1):
                    if rx.search(line):
                        hits.append(f"{rel}:{i}")
                        if len(hits) >= max_hits:
                            return hits
        except OSError:
            continue
    return hits


def inventory_audit(root, files, report):
    """Returns number of missing REQUIRED components."""
    report.append("\n## Component inventory vs SURVEY.md section 2\n")
    missing = 0
    fileset = set(files)
    dirset = {os.path.dirname(f) for f in files}
    for name, expected, symbols, required in INVENTORY:
        at_expected = [e for e in expected
                       if e in fileset or e in dirset
                       or any(f.startswith(e + "/") for f in fileset)]
        sym_hits = []
        for s in symbols:
            sym_hits += grep_tree(root, files, s, max_hits=2)
        if at_expected and sym_hits:
            status = "OK (expected layout)"
        elif sym_hits:
            status = "FOUND ELSEWHERE — survey correction: update section 2 path"
        elif at_expected:
            status = "path exists, symbols NOT matched — inspect by hand"
        else:
            status = ("MISSING" if required
                      else "absent (optional [C]-tier component)")
            if required:
                missing += 1
        ev = "; ".join(sym_hits[:4]) or ", ".join(at_expected) or "—"
        report.append(f"- **{name}**: {status} · {ev}")
    return missing


def hyperparam_audit(root, files, report):
    report.append("\n## Hyperparameter contract vs plr2_tpu/config.py\n")
    misses = 0
    for label, syms, ours in HYPERPARAMS:
        found = []
        for s in syms:
            found += extract_values(root, files, s)
        match = [(v, loc) for v, loc in found
                 if abs(v - ours) <= 1e-9 + 1e-6 * abs(ours)]
        if match:
            v, loc = match[0]
            report.append(f"- {label} = {ours:g}: OK (binds {v:g} · {loc})")
        elif found:
            misses += 1
            seen = "; ".join(f"{v:g} · {loc}" for v, loc in found[:4])
            report.append(
                f"- {label}: **DISCREPANCY** — reference binds "
                f"{'/'.join(syms)} to [{seen}], ours is {ours:g}. Correct "
                "config.py (and the curriculum/loss constants it feeds) "
                "to the reference's value.")
        else:
            misses += 1
            report.append(f"- {label} = {ours:g}: **NOT FOUND** — no "
                          f"numeric binding of {'/'.join(syms)} anywhere "
                          "in the mount; verify the reference's value by "
                          "hand and correct config.py if it differs")
    return misses


def find_pth(root, files):
    pose, refine, other = [], [], []
    for rel in files:
        if not rel.endswith((".pth", ".pt")):
            continue
        base = os.path.basename(rel).lower()
        if "refine" in base:
            refine.append(rel)
        elif "pose" in base or "model" in base:
            pose.append(rel)
        else:
            other.append(rel)
    return pose, refine, other


def _infer_head_arch(sd):
    """(num_obj, heads_are_conv1d) from a PoseNet state_dict."""
    for k in ("conv4_r.weight", "module.conv4_r.weight"):
        if k in sd:
            w = sd[k]
            return int(w.shape[0]) // 4, w.dim() == 3
    return None, None


def _np_refiner_forward(params, cloud, emb, obj):
    """Independent NumPy re-execution of the PoseRefineNet forward from
    the imported flax params (fallback parity oracle)."""
    import numpy as np

    def lin(sub, x):
        return x @ np.asarray(sub["kernel"]) + np.asarray(sub["bias"])

    def relu(x):
        return np.maximum(x, 0.0)

    f = params["feat"]
    x = relu(lin(f["conv1"], cloud))
    e = relu(lin(f["e_conv1"], emb))
    f1 = np.concatenate([x, e], -1)
    x = relu(lin(f["conv2"], x))
    e = relu(lin(f["e_conv2"], e))
    f2 = np.concatenate([x, e], -1)
    y = np.concatenate([f1, f2], -1)
    y = relu(lin(f["conv5"], y))
    y = relu(lin(f["conv6"], y))
    feat = y.mean(1)
    outs = {}
    for tag, od in (("r", 4), ("t", 3)):
        h = relu(lin(params[f"conv1_{tag}"], feat))
        h = relu(lin(params[f"conv2_{tag}"], h))
        h = lin(params[f"conv3_{tag}"], h)
        h = h.reshape(h.shape[0], -1, od)
        outs[tag] = h[np.arange(h.shape[0]), obj][:, None, :]
    return outs["r"], outs["t"]


def _try_reference_posenet(root, sd, num_obj, num_points, inputs):
    """Run the reference's own lib/network.py PoseNet if importable.
    Returns (r, t, c) numpy arrays of shape (1, N, {4,3,1}) or None."""
    import numpy as np
    import torch

    libdir = None
    for cand in ("lib/network.py", "network.py"):
        if os.path.exists(os.path.join(root, cand)):
            libdir = os.path.join(root, os.path.dirname(cand)) \
                if os.path.dirname(cand) else root
            break
    if libdir is None:
        return None, "lib/network.py not found in mount"
    sys.path.insert(0, root)
    sys.path.insert(0, libdir)
    modules_before = set(sys.modules)
    try:
        import importlib
        try:
            network = importlib.import_module(
                "lib.network" if libdir.endswith("lib") else "network")
        except ImportError:
            network = importlib.import_module("network")
        RefPoseNet = network.PoseNet
        model = RefPoseNet(num_points=num_points, num_obj=num_obj)
        model.load_state_dict(
            {k.replace("module.", ""): v for k, v in sd.items()},
            strict=False)
        model.eval()
        img, cloud, choose, obj = inputs
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tcloud = torch.from_numpy(cloud)
        tobj2 = torch.from_numpy(obj).long().view(-1, 1)
        attempts = [
            (timg, tcloud, torch.from_numpy(choose).long()[:, None, :], tobj2),
            (timg, tcloud, torch.from_numpy(choose).long(), tobj2),
            (timg, tcloud, torch.from_numpy(choose).long()[:, None, :],
             torch.from_numpy(obj).long()),
        ]
        last_err = None
        for a in attempts:
            try:
                with torch.no_grad():
                    out = model(*a)
                r, t, c = [np.asarray(x.detach()) for x in out[:3]]
                n = cloud.shape[1]
                # normalize to (B, N, d) regardless of transpose convention
                def norm(x, d):
                    x = x.reshape(x.shape[0], -1, d) if x.shape[-1] == d \
                        else x.reshape(x.shape[0], d, -1).transpose(0, 2, 1)
                    return x[:, :n, :]
                return (norm(r, 4), norm(t, 3), norm(c, 1)), None
            except Exception as e:  # try the next calling convention
                last_err = e
        return None, f"reference PoseNet call failed: {last_err!r}"
    except Exception as e:
        return None, f"reference source import failed: {e!r}"
    finally:
        # drop modules the reference import pulled in, so successive audits
        # (or a re-run after the user edits the mount) don't see stale code
        for m in set(sys.modules) - modules_before:
            sys.modules.pop(m, None)
        for p in (libdir, root):
            if p in sys.path:
                sys.path.remove(p)


def weight_parity(root, files, report, max_pth):
    """Import found .pth weights and run forward parity. Returns number
    of parity failures (unmatched keys or numeric mismatch)."""
    import numpy as np

    pose, refine, other = find_pth(root, files)
    if not (pose or refine or other):
        report.append("\n## Weight-level parity\n\nNo `.pth`/`.pt` files in "
                      "the mount — parity evidence remains the in-repo "
                      "torch-mirror tests (tests/test_torch_parity.py).")
        return 0

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from plr2_tpu.models.posenet import PoseNet, PoseRefineNet
    from plr2_tpu.models.torch_import import (import_posenet_state_dict,
                                              import_refinenet_state_dict)

    report.append("\n## Weight-level parity\n")
    failures = 0
    rng = np.random.default_rng(0)

    for rel in pose[:max_pth]:
        sd = torch.load(os.path.join(root, rel), map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        num_obj, conv1d_heads = _infer_head_arch(sd)
        if num_obj is None:
            report.append(f"- `{rel}`: no conv4_r head — not a PoseNet "
                          "checkpoint? keys: "
                          f"{sorted(sd)[:5]}...")
            continue
        if conv1d_heads is False:
            # the import map assumes the upstream Conv1d head layout
            # (out, in, 1); a 2-D Linear head means the survey misread
            # the architecture — surface it instead of silently
            # transposing wrong
            failures += 1
            report.append(
                f"- `{rel}`: head weights are 2-D (Linear), not the "
                "Conv1d layout SURVEY 2 documents — correct the survey "
                "and models/torch_import.py before trusting parity.")
            continue
        n, hw = 500, 80
        model = PoseNet(num_points=n, num_objects=num_obj)
        img = rng.normal(size=(1, hw, hw, 3)).astype(np.float32)
        cloud = (rng.normal(size=(1, n, 3)) * 0.1).astype(np.float32)
        choose = rng.integers(0, hw * hw, size=(1, n)).astype(np.int32)
        obj = np.array([min(2, num_obj - 1)], dtype=np.int32)
        variables = model.init(jax.random.key(0), jnp.asarray(img),
                               jnp.asarray(cloud), jnp.asarray(choose),
                               jnp.asarray(obj))
        variables = jax.tree_util.tree_map(np.asarray, dict(variables))
        variables, unmatched = import_posenet_state_dict(sd, variables)
        if unmatched:
            failures += 1
            report.append(
                f"- `{rel}`: **{len(unmatched)} unmatched keys** — the "
                "import map (models/torch_import.py) needs these survey "
                f"corrections: {unmatched[:8]}"
                f"{'...' if len(unmatched) > 8 else ''}")
            continue
        jr, jt, jc, _ = model.apply(
            {k: jax.tree_util.tree_map(jnp.asarray, v)
             for k, v in variables.items()},
            jnp.asarray(img), jnp.asarray(cloud), jnp.asarray(choose),
            jnp.asarray(obj))
        ref_out, why = _try_reference_posenet(
            root, sd, num_obj, n, (img, cloud, choose, obj))
        if ref_out is not None:
            rr, rt, rc = ref_out
            dr = float(np.max(np.abs(np.asarray(jr) - rr)))
            dt = float(np.max(np.abs(np.asarray(jt) - rt)))
            dc = float(np.max(np.abs(np.asarray(jc) - rc)))
            ok = dr < 2e-3 and dt < 2e-3 and dc < 2e-4
            failures += 0 if ok else 1
            report.append(
                f"- `{rel}`: reference-source forward parity "
                f"{'**PASS**' if ok else '**FAIL**'} (num_obj={num_obj}, "
                f"max|Δr|={dr:.2e}, max|Δt|={dt:.2e}, max|Δc|={dc:.2e})")
        else:
            # fallback: flax vs torch mirror, both on the REAL weights
            from plr2_tpu.models.torch_mirror import (TPoseNet,
                                                      transplant_posenet)
            tm = TPoseNet(num_obj).eval()
            transplant_posenet(tm, variables)
            with torch.no_grad():
                tr, tt, tc, _ = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                                   torch.from_numpy(cloud),
                                   torch.from_numpy(choose).long(),
                                   torch.from_numpy(obj).long())
            dr = float(np.max(np.abs(np.asarray(jr) - tr.numpy())))
            dt = float(np.max(np.abs(np.asarray(jt) - tt.numpy())))
            ok = dr < 2e-3 and dt < 2e-3
            failures += 0 if ok else 1
            report.append(
                f"- `{rel}`: all keys imported; reference source not "
                f"runnable ({why}); mirror-forward parity on the real "
                f"weights {'**PASS**' if ok else '**FAIL**'} "
                f"(max|Δr|={dr:.2e}, max|Δt|={dt:.2e})")

    for rel in refine[:max_pth]:
        sd = torch.load(os.path.join(root, rel), map_location="cpu",
                        weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        num_obj = None
        for k in ("conv3_r.weight", "module.conv3_r.weight"):
            if k in sd:
                num_obj = int(sd[k].shape[0]) // 4
        if num_obj is None:
            report.append(f"- `{rel}`: no conv3_r head — not a PoseRefineNet "
                          "checkpoint?")
            continue
        n = 500
        model = PoseRefineNet(num_points=n, num_objects=num_obj)
        cloud = (rng.normal(size=(1, n, 3)) * 0.1).astype(np.float32)
        emb = rng.normal(size=(1, n, 32)).astype(np.float32)
        obj = np.array([min(2, num_obj - 1)], dtype=np.int32)
        variables = model.init(jax.random.key(0), jnp.asarray(cloud),
                               jnp.asarray(emb), jnp.asarray(obj))
        variables = jax.tree_util.tree_map(np.asarray, dict(variables))
        variables, unmatched = import_refinenet_state_dict(sd, variables)
        if unmatched:
            failures += 1
            report.append(f"- `{rel}`: **{len(unmatched)} unmatched keys**: "
                          f"{unmatched[:8]}")
            continue
        jr, jt = model.apply(
            {k: jax.tree_util.tree_map(jnp.asarray, v)
             for k, v in variables.items()},
            jnp.asarray(cloud), jnp.asarray(emb), jnp.asarray(obj))
        nr, nt = _np_refiner_forward(variables["params"], cloud, emb, obj)
        dr = float(np.max(np.abs(np.asarray(jr) - nr)))
        dt = float(np.max(np.abs(np.asarray(jt) - nt)))
        ok = dr < 1e-4 and dt < 1e-4
        failures += 0 if ok else 1
        report.append(
            f"- `{rel}`: all keys imported; NumPy-oracle forward parity "
            f"{'**PASS**' if ok else '**FAIL**'} "
            f"(max|Δr|={dr:.2e}, max|Δt|={dt:.2e})")

    for rel in other[:max_pth]:
        report.append(f"- `{rel}`: unclassified checkpoint — inspect by hand")
    return failures


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default="", help="also write the report here")
    p.add_argument("--max-pth", type=int, default=4,
                   help="max checkpoints to parity-check per family")
    args = p.parse_args()

    report = ["# Reference mount audit", ""]
    files = list_files(args.reference) if os.path.isdir(args.reference) else []

    if not files:
        print("reference mount EMPTY (0 files) — mirror-parity evidence "
              "stands (tests/test_torch_parity.py; SURVEY.md section 0).")
        return 0

    report.append(f"Mount populated: **{len(files)} files** under "
                  f"`{args.reference}`. Auditing against SURVEY.md.")
    missing = inventory_audit(args.reference, files, report)
    hp_misses = hyperparam_audit(args.reference, files, report)
    parity_failures = weight_parity(args.reference, files, report,
                                    args.max_pth)

    verdict = ("PARITY FAILURE — fix models/ or torch_import.py before "
               "trusting any fidelity claim" if parity_failures else
               "discrepancies found — apply the survey corrections above"
               if (missing or hp_misses) else
               "mount matches the survey; replace section 2's VERIFY "
               "markers with the file:line evidence above")
    report.append(f"\n## Verdict\n\n{verdict}\n")
    text = "\n".join(report)
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
    return 2 if parity_failures else (1 if (missing or hp_misses) else 0)


if __name__ == "__main__":
    sys.exit(main())
